"""Canonicalization via connected components over alias/redirect
equivalence edges (north_rule: "canonicalization via connected-components
over alias/redirect broadcast maps"; SURVEY.md §7.1, §7.3.7).

Two complementary operators:

- kb.resolve_redirect_closure (J2) reproduces the reference's bounded
  pointer chase exactly (GENRE/genre/utils.py:454-464) — per-anchor
  parity semantics, directed, ≤10 hops.
- connected_components here is the KB-construction-side canonicalizer:
  treat redirect pairs / alias-identity pairs as UNDIRECTED equivalence
  edges, compute components, and assign one deterministic canonical
  representative per component (min sort key — for QIDs, the minimum
  numeric id). Applied to subjects/objects before triple emission, it
  collapses duplicate entities that the bounded chase cannot (cycles,
  diamonds, alias-merged ids).

Algorithm: iterative min-label propagation + one pointer-jump (label ←
label of label) per round — the classic "hash-to-min" scheme, O(log n)
rounds on typical graphs instead of O(diameter) for plain propagation.
Each round is two broadcast-joinable equi-joins + a groupBy; labels are
localCheckpoint'ed per round — that truncates the LOGICAL plan (plain
persist does not), which otherwise grows exponentially across iterated
self-joins.
At 100 TB the same loop runs with the edge list partitioned by `a` and
AQE handling the (rare) skewed super-component; GraphFrames CC is a
drop-in replacement when the package is available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from kgpipe.kb import qid_num

# backend actually used by the last connected_components call:
# "graphframes" when the package + jar are importable, else "loop"
last_cc_backend: str | None = None
# label-propagation rounds the last loop-backend call took to converge
# (incl. the final no-change round). Exposed for the skew/convergence
# tests: hash-to-min is O(log n) rounds, and a regression here turns
# directly into serial loop jobs at billion-edge scale.
last_cc_rounds: int | None = None


def _graphframes_unusable(spark) -> str | None:
    """None when the GraphFrames path can actually run; else the reason
    it cannot. A Python `import graphframes` alone is NOT sufficient —
    a pip-installed package without the JVM jar on the classpath, or a
    SparkContext without a checkpoint dir (required by GraphFrames
    connectedComponents), fails with a Py4J error at the first action,
    which would break backend='auto''s documented fallback."""
    try:
        import graphframes  # noqa: F401
    except ImportError:
        return "python package not importable"
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.graphframes.GraphFrame")
    except Exception:  # pragma: no cover - needs pip pkg without jar
        return "org.graphframes.GraphFrame not on the JVM classpath"
    try:  # pragma: no cover - requires graphframes jar
        if spark.sparkContext.getCheckpointDir() is None:
            return "sparkContext checkpoint dir unset (required by CC)"
    except Exception:  # pragma: no cover
        return "sparkContext checkpoint dir unset (required by CC)"
    return None  # pragma: no cover - requires graphframes jar


def _graphframes_cc(sym: DataFrame, keyf, max_iter: int) -> DataFrame:
    """GraphFrames drop-in (used when the graphframes package + jar are
    present — not in this sandbox): run its scalable CC, then remap each
    component id to the member node minimizing keyf so the output
    contract (deterministic min-key representative) is identical to the
    hash-to-min loop."""  # pragma: no cover - requires graphframes jar
    from graphframes import GraphFrame

    vertices = sym.select(F.col("a").alias("id")).distinct()
    g = GraphFrame(vertices, sym.select(F.col("a").alias("src"),
                                        F.col("b").alias("dst")))
    cc = g.connectedComponents()  # (id, component: long)
    reps = (
        cc.groupBy("component")
        .agg(F.min_by("id", keyf(F.col("id"))).alias("rep"))
    )
    return cc.join(reps, "component").select(
        F.col("id").alias("node"), F.col("rep").alias("component"))


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    key=None,
    max_iter: int = 50,
    backend: str = "auto",
) -> DataFrame:
    """(src, dst) undirected edges → (node, component); component is the
    member node minimizing `key(node)` (default: min in the node's own
    type ordering). Nodes keep their INPUT type end-to-end — long doc_ids
    shuffle as 8-byte longs, never as decimal strings (the CC shuffle key
    is the dominant byte stream at billion-edge scale).
    Isolated nodes don't appear in edges and map to themselves — union
    them in downstream (canonicalize_qids leaves unmapped ids as-is).

    backend: "auto" uses GraphFrames when the package AND jar are usable
    (checked up front; the GraphFrames result is materialized inside the
    guarded region, so even failures GraphFrames defers to the first
    action fall back to the loop — a broken install can't take down
    default callers), "loop" / "graphframes" force one path
    ("graphframes" raises on an unusable install).
    kgpipe.canonical.last_cc_backend records which path ran;
    last_cc_rounds the loop rounds to convergence.
    """
    global last_cc_backend, last_cc_rounds
    keyf = key or (lambda c: c)

    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    if backend in ("auto", "graphframes"):
        reason = _graphframes_unusable(edges.sparkSession)
        if reason is None:  # pragma: no cover - requires graphframes jar
            try:
                last_cc_backend = "graphframes"
                # the loop-round counter is meaningless for this backend;
                # clear it so telemetry read after an auto->graphframes
                # run can't pick up a stale value from a prior loop call
                last_cc_rounds = None
                # materialize INSIDE the guarded region: GraphFrames
                # failures deferred to the caller's first action on the
                # lazy result (e.g. the min_by remap join) would escape
                # this except and break backend="auto"'s documented
                # fallback. The eager localCheckpoint also detaches the
                # result from its inputs, so callers may unpersist/free
                # the edge frame immediately (dedup_clusters relies on
                # this for both backends).
                return _graphframes_cc(sym, keyf, max_iter).localCheckpoint(
                    eager=True)
            except Exception:
                if backend == "graphframes":
                    raise
                # auto: a runtime Py4J/analysis failure degrades to the
                # loop instead of failing every default CC caller
                last_cc_backend = "loop"
        elif backend == "graphframes":
            raise ImportError(f"graphframes backend unusable: {reason}")
    last_cc_backend = "loop"

    def lab_struct(node_col):
        return F.struct(keyf(node_col).alias("k"), node_col.alias("n"))

    # localCheckpoint per round: truncates the LOGICAL plan, not just
    # execution — without it the iterated self-joins grow the plan
    # exponentially and Catalyst itself becomes the bottleneck
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node")).distinct()
        .select("node", lab_struct(F.col("node")).alias("comp"))
        .localCheckpoint(eager=True)
    )

    last_cc_rounds = 0
    for _ in range(max_iter):
        last_cc_rounds += 1
        # (1) adopt the min label among self + neighbors
        nbr = (
            sym.join(
                labels.select(F.col("node").alias("b"),
                              F.col("comp").alias("b_comp")),
                "b",
            )
            .groupBy("a")
            .agg(F.min("b_comp").alias("nbr_comp"))
            .withColumnRenamed("a", "node")
        )
        stepped = labels.join(nbr, "node", "left").select(
            "node",
            F.col("comp").alias("old_comp"),
            F.least("comp", F.coalesce("nbr_comp", "comp")).alias("comp"),
        )
        # (2) pointer jump: comp ← comp(comp.n) — path compression
        mapping = stepped.select(
            F.col("node").alias("m_node"), F.col("comp").alias("m_comp")
        )
        new_comp = F.least("comp", F.coalesce("m_comp", "comp"))
        # the convergence check rides the SAME job as the per-round
        # localCheckpoint via a Dataset observation (changed-label count
        # as an accumulator metric) — 1 job per round instead of the
        # 3 (checkpoint + join + count) a driver-side recount costs;
        # at billion-edge scale the loop's serial job floor halves
        obs = Observation()
        jumped = (
            stepped.join(mapping, stepped["comp.n"] == mapping["m_node"], "left")
            .select(
                "node",
                new_comp.alias("comp"),
                (new_comp.getField("n") != F.col("old_comp").getField("n"))
                .cast("long").alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("changed"))
            .select("node", "comp")
            .localCheckpoint(eager=True)
        )
        labels = jumped
        if (obs.get["changed"] or 0) == 0:
            break

    out = labels.select("node", F.col("comp.n").alias("component"))
    return out


def canonicalize_qids(equiv_edges: DataFrame, src_col: str = "src",
                      dst_col: str = "dst", max_iter: int = 50) -> DataFrame:
    """QID equivalence edges → (qid, canonical_qid) with the minimum
    NUMERIC QID as the canonical representative (deterministic; the
    J1 max-QID tiebreak is a per-lookup rule, canonical ids follow the
    min-id convention so merged entities keep their oldest id)."""
    cc = connected_components(
        equiv_edges, src_col, dst_col, key=qid_num, max_iter=max_iter
    )
    return cc.select(F.col("node").alias("qid"),
                     F.col("component").alias("canonical_qid"))


def redirect_equivalence_edges(redirects: DataFrame,
                               title_map: DataFrame) -> DataFrame:
    """Redirect pairs lifted to QID space: (lang, src_title → dst_title)
    where BOTH titles independently resolve to QIDs yield an equivalence
    edge between those QIDs — the 'same page under two ids' signal that
    the bounded chase can't merge. Broadcast joins only."""
    tm = F.broadcast(title_map)
    src_q = redirects.join(
        tm.select("lang", F.col("title").alias("src_title"),
                  F.col("qid").alias("src_qid")),
        ["lang", "src_title"],
    )
    return src_q.join(
        F.broadcast(title_map.select(
            "lang", F.col("title").alias("dst_title"),
            F.col("qid").alias("dst_qid"))),
        ["lang", "dst_title"],
    ).select(F.col("src_qid").alias("src"), F.col("dst_qid").alias("dst")) \
     .distinct()


def apply_canonicalization(df: DataFrame, mapping: DataFrame,
                           cols: list[str]) -> DataFrame:
    """Rewrite QID columns through the (qid, canonical_qid) mapping;
    ids outside any component pass through unchanged. One broadcast
    join per column — zero shuffles on the fact stream."""
    out = df
    for c in cols:
        m = F.broadcast(mapping.select(
            F.col("qid").alias(f"_{c}_qid"),
            F.col("canonical_qid").alias(f"_{c}_canon")))
        out = (
            out.join(m, out[c] == F.col(f"_{c}_qid"), "left")
            .withColumn(c, F.coalesce(F.col(f"_{c}_canon"), F.col(c)))
            .drop(f"_{c}_qid", f"_{c}_canon")
        )
    return out
