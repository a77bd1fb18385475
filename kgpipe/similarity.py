"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline and an LSH-bucketed
variant as the scale path. Dot products run as JVM-side `aggregate`/
`zip_with` expressions in double precision (order-stable left-to-right
fold → bit-reproducible across engines); no Python in the hot path.

Scale notes: brute-force is queries × corpus — fine for a broadcast
query set (re-ranking, eval); the LSH variant buckets by sign-random
projections so candidate generation is an equi-join on bucket keys,
the same shape as dedup.minhash_lsh_pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic pseudo-random hyperplanes: plane p, dim d weight =
# sin(1 + (p+1)*(d+1)) — reproducible in any engine with a sin()
N_PLANES = 8


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def with_norm(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return embeddings.withColumn("l2_norm", F.round(_norm(F.col(vec_col)), 6))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query (brute force): broadcast the
    query set, rank by cosine desc with (rounded cosine, neighbor id)
    deterministic ordering. Self-pairs excluded."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (_norm(F.col("q_vec")) * _norm(F.col("n_vec"))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def _bucket_arr_expr(vec_col: str, n_tables: int, planes_per_table: int,
                     p0: int = 0) -> "F.Column":
    """Array of `n_tables` bucket keys from ONE pass over the vector.

    A single aggregate keeps all n_tables·planes_per_table running
    projections: per vector element, a transform adds x_d·w_{p,d} to
    every plane's partial sum (w_{p,d} = sin(1 + (p0+p+1)(d+1)), the
    deterministic hyperplane family — reproducible in any engine with
    libm sin()). The per-plane fold order is exactly the r3 per-plane
    aggregate's left-to-right order, so projections — and therefore
    sign bits and bucket keys — are bit-for-bit identical to the old
    one-aggregate-per-plane form, which re-built the weight array and
    re-folded the whole vector once per plane (K× the per-row work;
    q28/q42 hashes unchanged by this rewrite, verified). The finish
    lambda folds sign bits into per-table integer keys inside the same
    expression, so the projection array is evaluated exactly once (no
    Catalyst re-inlining of the aggregate per consumer)."""
    k = n_tables * planes_per_table
    return F.expr(
        f"aggregate("
        f"zip_with({vec_col}, sequence(1, size({vec_col})),"
        f" (x, d) -> struct(cast(x as double) as x, d as d)),"
        f"array_repeat(cast(0.0 as double), {k}),"
        f"(acc, e) -> transform(acc, (a, p) ->"
        f" a + e.x * sin(cast(1 + ({p0} + p + 1) * (e.d + 1) as double))),"
        f"acc -> transform(sequence(0, {n_tables - 1}), t ->"
        f" cast(aggregate(sequence(0, {planes_per_table - 1}), 0, (s, j) ->"
        f"  s + if(element_at(acc, t * {planes_per_table} + j + 1) > 0D,"
        f"   shiftleft(1, j), 0)) as int)))"
    )


def lsh_bucket(embeddings: DataFrame, vec_col: str = "embedding",
               id_col: str = "vec_id", n_planes: int = N_PLANES) -> DataFrame:
    """Sign-random-projection bucket key per vector: bit_p =
    (Σ_d v_d · sin(1 + (p+1)(d+1))) > 0. Returns (id, bucket)."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(_bucket_arr_expr(vec_col, 1, n_planes), 1)
        .alias("bucket"),
    )


def lsh_candidate_pairs(embeddings: DataFrame, **kw) -> DataFrame:
    """ANN candidate pairs = same LSH bucket (equi-join, linear shape)."""
    b = lsh_bucket(embeddings, **kw)
    return (
        b.alias("l").join(b.alias("r"), "bucket")
        .filter(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(F.col("l.vec_id").alias("a"), F.col("r.vec_id").alias("b"),
                "bucket")
    )


def lsh_bucket_tables(embeddings: DataFrame, vec_col: str = "embedding",
                      id_col: str = "vec_id", n_tables: int = 4,
                      planes_per_table: int = 4) -> DataFrame:
    """Banded multi-table LSH: N independent hash tables of fewer planes
    each — the cosine-side analog of MinHash banding (dedup.py). A
    single K-plane table's recall decays sharply at corpus scale (a
    near-neighbor pair must agree on ALL K sign bits, P = (1−θ/π)^K);
    with N tables of K/N planes a pair is a candidate if it agrees on
    any one table, P = 1 − (1 − (1−θ/π)^(K/N))^N — far higher recall
    for the same total plane budget, at the cost of N bucket joins
    (still linear shape, same as the MinHash band joins).

    Global plane index p = table·planes_per_table + plane, weight
    sin(1 + (p+1)(d+1)) — table 0 with planes_per_table = N_PLANES
    reproduces lsh_bucket exactly. All n_tables·planes_per_table
    projections come from ONE pass over the vector (_bucket_arr_expr).
    Returns (vec_id, table, bucket)."""
    wide = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _bucket_arr_expr(vec_col, n_tables, planes_per_table)
        .alias("_buckets"),
    )
    return wide.select(
        "vec_id",
        F.posexplode("_buckets").alias("table", "bucket"),
    )


def lsh_multitable_pairs(embeddings: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id", n_tables: int = 4,
                         planes_per_table: int = 4) -> DataFrame:
    """ANN candidate pairs from the multi-table index: same (table,
    bucket) in ANY table — one equi-join on the exploded index, distinct
    over tables. Feed to an exact-cosine re-rank (cf. q42) exactly like
    the single-table verify composition (q29)."""
    b = lsh_bucket_tables(embeddings, vec_col=vec_col, id_col=id_col,
                          n_tables=n_tables,
                          planes_per_table=planes_per_table)
    return (
        b.alias("l").join(b.alias("r"), ["table", "bucket"])
        .filter(F.col("l.vec_id") < F.col("r.vec_id"))
        .select(F.col("l.vec_id").alias("a"), F.col("r.vec_id").alias("b"))
        .distinct()
    )
