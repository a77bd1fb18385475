"""Noop-sink isolation bench (guide §1.4) — NOT the driver contract.

`bench.py` (frozen for measurement) times `df.count()` per query; count
lets the optimizer prune output columns, so for optimization work this
harness additionally times each query against the built-in noop sink,
which computes EVERY column of every row and discards it — the number
that exposes output-projection cost (e.g. a re-rank whose cosine column
is pruned by count but paid by a real consumer).

Per query it reports best/median wall seconds over N interleaved trials
for BOTH sinks, plus the bench.py-identical count. Used for the
before/after evidence in OPTIMIZATION_r07.md; never replaces bench.py.

Usage:
  python scripts/bench_extra.py [sf_dir] [q1,q2,...] [trials]
  (defaults: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1; the heavy
   similarity/pipeline subset; 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kgpipe.hostload import load_probe_gbps  # noqa: E402
from kgpipe.session import get_spark  # noqa: E402

DEFAULT_QUERIES = (
    "q20_cosine_topk,q24_span_mentions,q25_kg_triples,"
    "q29_lsh_cosine_verify,q42_lsh_multitable,q46_ivf_topk"
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = [n for n in
             (sys.argv[2] if len(sys.argv) > 2 and sys.argv[2]
              else DEFAULT_QUERIES).split(",") if n]
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("kgpipe-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    res: dict[str, dict[str, list[float]]] = {
        n: {"noop": [], "count": []} for n in names}
    rows: dict[str, int] = {}
    load_probe_gbps()  # warm the probe buffer
    probes = []
    for t in range(trials):
        probes.append(load_probe_gbps())
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra noop {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            res[name]["noop"].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(f"bench_extra count {name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            rows[name] = df.count()
            df.unpersist()
            res[name]["count"].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"# pass {t + 1}/{trials} (probe {probes[-1]} GB/s)",
              file=sys.stderr)

    print(json.dumps({
        "metric": "noop_isolation",
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "trials": trials,
        "load_probe_gbps": probes,
        "queries": {
            n: {
                "rows": rows[n],
                "noop_best": min(v["noop"]),
                "noop_median": round(statistics.median(v["noop"]), 3),
                "count_best": min(v["count"]),
                "count_median": round(statistics.median(v["count"]), 3),
            } for n, v in res.items()
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
