"""Entity classification + majority vote (SURVEY.md §2.5 A2, §3.3;
reference run_text_classification.py + dataset.py).

Feature assembly follows dataset.py:40-56 exactly:
  "... [START_ENT] mention [END_ENT] ... [TAB] wikidata_summary [TAB]
   arg1, arg2 [TAB] wikipedia_summary"

The XLM-R 36-way classifier is replaced by a deterministic keyword
scorer with the same I/O contract: per category, count occurrences of
its keyword among the feature tokens; argmax with a documented
deterministic tiebreak (count desc, category name asc — the reference's
Python-set tiebreak at run_tokenclass.py:55-58 is nondeterministic).
The scorer is a pure column expression (36 filter/size subexpressions +
array_min over structs) — zero shuffle, whole-stage codegen, no UDF.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgpipe.tags import FINE_CATEGORIES

DEFAULT_KEYWORDS: Dict[str, str] = {
    c: c.lower().replace("/", "-") for c in FINE_CATEGORIES
}


def assemble_features(enriched: DataFrame) -> DataFrame:
    """dataset.py:40-56 feature string; [START]/[END] markers become the
    classification variant [START_ENT]/[END_ENT] (dataset.py:42-44)."""
    marked_ent = F.regexp_replace(
        F.regexp_replace(F.col("marked_text"), r"\[START\]", "[START_ENT]"),
        r"\[END\]", "[END_ENT]",
    )
    return enriched.withColumn(
        "feature_text",
        F.concat(
            marked_ent,
            F.lit(" [TAB] "), F.col("wikidata_summary"),
            F.lit(" [TAB] "), F.concat_ws(", ", F.col("wikidata_arguments")),
            F.lit(" [TAB] "), F.col("wikipedia_summary"),
        ),
    )


FALLBACK_LABEL = sorted(DEFAULT_KEYWORDS)[0]  # zero keyword hits →
# lexicographically-first category (identical to the argmax-with-
# tiebreak outcome when every count is zero)


def _score_features(feats: DataFrame, keywords: Dict[str, str]) -> DataFrame:
    """Keyword scorer as explode + broadcast dim join + argmax.

    (An earlier all-expression variant — 36 size(filter(...)) subtrees
    inside array_min — produced a plan Catalyst took ~60s to optimize;
    the join form plans in milliseconds and every aggregation below is
    satisfied by the mention_id partitioning, so it adds no exchange.)
    Returns (mention_id, pred_label, pred_score).
    """
    spark = feats.sparkSession
    kw_dim = F.broadcast(spark.createDataFrame(
        [(v, k) for k, v in sorted(keywords.items())],
        "kw string, category string",
    ))
    hits = (
        feats.select("mention_id",
                     F.explode(F.split(F.lower("feature_text"), " ")).alias("kw"))
        .join(kw_dim, "kw")
        .groupBy("mention_id", "category")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        hits.groupBy("mention_id")
        .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                            F.col("category").alias("category"))).alias("m"))
        .select("mention_id", F.col("m.category").alias("pred_label"),
                (-F.col("m.neg")).alias("pred_score"))
    )


def classify(enriched: DataFrame, keywords: Dict[str, str] | None = None) -> DataFrame:
    keywords = keywords or DEFAULT_KEYWORDS
    feats = assemble_features(enriched)
    scored = _score_features(feats, keywords)
    # shuffle_hash on the slim scored side: the planner's sort-merge
    # would Tungsten-sort the WIDE enriched stream (marked_text +
    # summaries per row) just to attach a 3-column per-mention score;
    # hashing the slim side streams the wide side unsorted (guide §3.1
    # — same rationale as enrich.attach_decisions)
    return (
        enriched.join(scored.hint("shuffle_hash"), "mention_id", "left")
        .withColumn("pred_label",
                    F.coalesce("pred_label", F.lit(FALLBACK_LABEL)))
        .withColumn("pred_score", F.coalesce("pred_score", F.lit(0)))
    )


FEATURE_VARIANTS = [
    # (include_summary, include_arguments, include_wikipedia) — the
    # reference's ensemble varies model seeds
    # (run_text_classification.py:483-577); the deterministic analog
    # varies the KB-context ablation, mirroring the dataset.py flags
    # include_wikidata_description / _arguments / wikipedia_summary.
    (True, True, True),
    (True, True, False),
    (True, False, True),
    (False, True, True),
    (True, False, False),
]


def assemble_features_variant(enriched: DataFrame, include_summary: bool,
                              include_arguments: bool,
                              include_wikipedia: bool) -> DataFrame:
    """dataset.py:50-55 feature flags as a variant assembler."""
    marked_ent = F.regexp_replace(
        F.regexp_replace(F.col("marked_text"), r"\[START\]", "[START_ENT]"),
        r"\[END\]", "[END_ENT]",
    )
    feat = marked_ent
    if include_summary:
        feat = F.concat(feat, F.lit(" [TAB] "), F.col("wikidata_summary"))
    if include_arguments:
        feat = F.concat(feat, F.lit(" [TAB] "),
                        F.concat_ws(", ", F.col("wikidata_arguments")))
    if include_wikipedia:
        feat = F.concat(feat, F.lit(" [TAB] "), F.col("wikipedia_summary"))
    return enriched.withColumn("feature_text", feat)


def classify_ensemble(enriched: DataFrame, n_variants: int = 5,
                      keywords: Dict[str, str] | None = None) -> DataFrame:
    """A2 ensembled classification: run the scorer over n feature-
    ablation variants, then per-mention majority vote with the
    documented deterministic tiebreak (count desc, label asc) —
    run_tokenclass.py:26-60 semantics without the Python-set
    nondeterminism. Adds pred_label."""
    keywords = keywords or DEFAULT_KEYWORDS
    variants = FEATURE_VARIANTS[:n_variants]
    # variants with zero hits are absent from _score_features' output →
    # left-join per variant so every mention casts a vote (zero hits →
    # FALLBACK_LABEL, matching the single-scorer semantics)
    all_m = enriched.select("mention_id")
    full_votes = None
    for (s, a, w) in variants:
        feats = assemble_features_variant(enriched, s, a, w)
        v = all_m.join(_score_features(feats, keywords), "mention_id", "left") \
            .select("mention_id",
                    F.coalesce("pred_label", F.lit(FALLBACK_LABEL)).alias("label"))
        full_votes = v if full_votes is None else full_votes.unionByName(v)
    voted = majority_vote(full_votes, ["mention_id"], "label").withColumnRenamed(
        "voted_label", "pred_label"
    )
    return enriched.join(voted, "mention_id", "left")


def majority_vote(df: DataFrame, key_cols: List[str],
                  label_col: str = "label") -> DataFrame:
    """A2 per-key majority vote over N ensemble rows
    (run_tokenclass.py:26-60 semantics) with the deterministic tiebreak
    documented in SURVEY.md §2.5: modal count desc, then label asc.
    Pure groupBy chain — partial aggregation map-side."""
    counted = df.groupBy(*key_cols, label_col).agg(F.count("*").alias("cnt"))
    return (
        counted.groupBy(*key_cols)
        .agg(F.min(F.struct((-F.col("cnt")).alias("neg"),
                            F.col(label_col).alias("label"))).alias("m"))
        .select(*key_cols, F.col("m.label").alias("voted_label"))
    )
