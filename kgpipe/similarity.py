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
    # norms are computed BELOW the join — once per vector row, never
    # per candidate pair (at 100 TB the corpus norm is a stored column;
    # unrounded, so the cosine value is bit-identical to the per-pair
    # _norm form)
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"),
            _norm(F.col(vec_col)).alias("_qn"),
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("_nn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("_qn") * F.col("_nn")),
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


def ivf_centroids(embeddings: DataFrame, n_cells: int = 8,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Deterministic coarse quantizer for IVF: the n_cells lowest-id
    vectors serve as cell centroids (cell id = the seed's vec_id). A
    production 100 TB index trains the quantizer offline (k-means /
    PQ); the SERVING shape downstream — assign, probe, re-rank — is
    identical, and a trained centroid table drops in for this one."""
    return embeddings.orderBy(F.col(id_col).asc()).limit(n_cells).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("centroid"))


def ivf_train(embeddings: DataFrame, n_cells: int = 8, n_iter: int = 3,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Lloyd's k-means as DataFrame ops — turns the deterministic seed
    pick (ivf_centroids) into TRAINED centroids, closing the cell-balance
    gap: lowest-id seeds give no balance guarantee, and at corpus scale
    one fat cell turns the IVF candidate equi-join into a hot partition.
    Each iteration is assign (the existing ivf_assign: broadcast
    centroids + argmin) then update (posexplode the assigned vectors →
    groupBy(cell, dimension) avg — map-side combinable, so the update
    shuffle carries (cell, dim, partial-sum) rows, never vectors →
    refold to centroid arrays via a deterministic pos-sorted collect).
    Cells that lose all members drop out (standard drop-empty policy),
    so the result may have < n_cells rows. Returns (cell, centroid) —
    drops straight into ivf_topk(centroids=...) / ivf_assign.

    Run-to-run determinism note: avg() is a parallel mean — its
    partial-sum order is partition-dependent, so trained centroids are
    deterministic in VALUE up to float summation order (~1 ulp), unlike
    the bit-pinned serving path. A production index trains once and
    persists the centroid table; tests pin behavior (balance, recall),
    not bits."""
    cent = ivf_centroids(embeddings, n_cells, vec_col, id_col)
    for _ in range(n_iter):
        assign = ivf_assign(embeddings, cent, vec_col, id_col)
        means = (
            embeddings.select(F.col(id_col).alias("vec_id"),
                              F.col(vec_col).alias("_v"))
            .join(assign, "vec_id")
            .select("cell", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("cell", "_pos")
            .agg(F.avg(F.col("_x").cast("double")).alias("_m"))
        )
        cent = (
            means.groupBy("cell")
            .agg(F.array_sort(
                F.collect_list(F.struct(F.col("_pos"), F.col("_m")))
            ).alias("_pm"))
            .select("cell", F.expr("transform(_pm, e -> e._m)")
                    .alias("centroid"))
            # truncate the iterated plan per round (the CC lesson:
            # iterated self-referential plans otherwise grow until
            # Catalyst itself is the bottleneck) and materialize the
            # tiny centroid table each broadcast consumer reuses
            .localCheckpoint(eager=True)
        )
    return cent


def _sq_dist(a, b):
    """Squared L2 via the dot identity |a|²+|b|²−2a·b — three ordered
    folds, bit-reproducible cross-engine like _dot (q20/q29)."""
    return _dot(a, a) + _dot(b, b) - 2.0 * _dot(a, b)


def ivf_assign(embeddings: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(vec_id, cell): nearest centroid by squared L2 — broadcast the
    (tiny) centroid table, argmin via a struct-min aggregation with a
    deterministic (rounded dist, cell) tiebreak. Linear in corpus size;
    the only shuffle is the per-vector groupBy."""
    c = F.broadcast(centroids)
    scored = (
        embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("_v"))
        .crossJoin(c)
        .withColumn("_d", F.round(_sq_dist(F.col("_v"), F.col("centroid")), 6))
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct(F.col("_d"), F.col("cell"))).alias("_m"))
        .select("vec_id", F.col("_m.cell").alias("cell"))
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 3,
             n_cells: int = 8, nprobe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             centroids: DataFrame | None = None) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus into cells, probe each
    query's nprobe nearest cells, exact-cosine re-rank inside the
    probed candidates — the third ANN scale path next to single-table
    LSH (q28/q29) and banded multi-table LSH (q42). Candidate
    generation is an equi-join on cell (linear); nprobe/n_cells trade
    recall against probe cost exactly as in a production IVF index.
    Pass `centroids` (e.g. from ivf_train) to serve against a trained
    quantizer — n_cells is then ignored. Returns (query_id, neighbor_id,
    rank, cosine), rank ≤ k."""
    cent = (centroids if centroids is not None
            else ivf_centroids(embeddings, n_cells, vec_col, id_col))
    assign = ivf_assign(embeddings, cent, vec_col, id_col)

    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"),
                       _norm(F.col(vec_col)).alias("_qn"))
    q_scored = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("_d", F.round(_sq_dist(F.col("q_vec"), F.col("centroid")), 6))
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("_d").asc(), F.col("cell").asc())
    q_cells = (
        q_scored.withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "_qn", "cell")
    )
    cand = (
        q_cells.join(
            assign.join(
                embeddings.select(F.col(id_col).alias("vec_id"),
                                  F.col(vec_col).alias("n_vec"),
                                  _norm(F.col(vec_col)).alias("_nn")),
                "vec_id",
            ).withColumnRenamed("vec_id", "neighbor_id"),
            "cell",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    # per-vector norms from below the join (bit-identical, never
    # recomputed per candidate pair)
    scored = cand.withColumn(
        "cosine",
        F.round(
            _dot(F.col("q_vec"), F.col("n_vec"))
            / (F.col("_qn") * F.col("_nn")),
            6,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
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
