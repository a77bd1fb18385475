"""Deterministically scale the sf0.1 testdata tables that the heavy
bench queries read (documents, embeddings) by an integer factor K —
the round-5 verdict's sf1.0 ask: all local bench evidence was sf0.1;
this synthesizes a 10x input (no external data, seeded, reproducible)
so the q25/ANN plans get a second scale point.

Replication semantics (keeps the workload an honest Kx of sf0.1):
- documents: replica k remaps doc_id += k*10^7 and source += "#rk"
  (k>0) — K*20 conversations of the SAME length/text distribution, so
  q25's per-conversation work is unchanged and the corpus is Kx wider
  (not Kx-longer conversations, which would change the span state
  machine's per-group profile).
- embeddings: replica k remaps vec_id += k*10^7 and draws NEW unit
  vectors as normalize(v + N(0, 0.1^2) noise, seed=k) — distinct
  vectors with the same distribution shape, so LSH bucket densities
  grow the way real Kx data grows (exact-duplicate replicas would
  pile into identical buckets AND identical cosines, degenerating the
  re-rank ties).

Usage: python scripts/gen_sf_scale.py [K] [out_dir]
       (defaults: 10 /tmp/kgs_sf1)
"""

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kgs_sf1"
SRC = "/root/testdata/sf0.1"
ID_STRIDE = 10_000_000


def main():
    import os

    os.makedirs(OUT, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = docs.column("doc_id").to_numpy()
    # replica ids are offset by k*ID_STRIDE — a source id at or above
    # the stride would silently collide across replicas (ADVICE r6)
    assert doc_id.max() < ID_STRIDE, "doc_id exceeds replica ID_STRIDE"
    source = np.array(docs.column("source").to_pylist())
    reps = []
    for k in range(K):
        reps.append(pa.table({
            "doc_id": pa.array(doc_id + k * ID_STRIDE, type=pa.int64()),
            "text": docs.column("text"),
            "lang": docs.column("lang"),
            "source": pa.array(
                source if k == 0
                else np.char.add(source, f"#r{k}")),
            "n_chars": docs.column("n_chars"),
        }))
    big_docs = pa.concat_tables(reps)
    pq.write_table(big_docs, f"{OUT}/documents.parquet",
                   row_group_size=50_000)
    print(f"documents: {big_docs.num_rows} rows "
          f"({docs.num_rows} x {K})")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = emb.column("vec_id").to_numpy()
    assert vec_id.max() < ID_STRIDE, "vec_id exceeds replica ID_STRIDE"
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = emb.column("label")
    reps = []
    for k in range(K):
        if k == 0:
            v = vecs
        else:
            rng = np.random.default_rng(k)
            v = vecs + rng.normal(0, 0.1, vecs.shape).astype(np.float32)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
        reps.append(pa.table({
            "vec_id": pa.array(vec_id + k * ID_STRIDE, type=pa.int64()),
            "embedding": pa.array(list(v),
                                  type=pa.list_(pa.float32())),
            "label": labels,
        }))
    big_emb = pa.concat_tables(reps)
    pq.write_table(big_emb, f"{OUT}/embeddings.parquet",
                   row_group_size=50_000)
    print(f"embeddings: {big_emb.num_rows} rows "
          f"({emb.num_rows} x {K})")


if __name__ == "__main__":
    main()
