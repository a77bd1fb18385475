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


def keyword_scores_expr(keywords: Dict[str, str] | None = None):
    """array<struct<neg_cnt, category>> over lowercase feature tokens;
    array_min picks (max count, then lexicographically-min category)."""
    keywords = keywords or DEFAULT_KEYWORDS
    structs = []
    for cat in sorted(keywords):
        kw = keywords[cat].replace("'", "''")
        cnt = F.expr(f"size(filter(feat_tokens, t -> t = '{kw}'))")
        structs.append(F.struct((-cnt).alias("neg_cnt"), F.lit(cat).alias("category")))
    return F.array_min(F.array(*structs))


def classify(enriched: DataFrame, keywords: Dict[str, str] | None = None) -> DataFrame:
    feats = assemble_features(enriched).withColumn(
        "feat_tokens", F.split(F.lower(F.col("feature_text")), " ")
    )
    best = keyword_scores_expr(keywords)
    return (
        feats.withColumn("_best", best)
        .withColumn("pred_label", F.col("_best.category"))
        .withColumn("pred_score", -F.col("_best.neg_cnt"))
        .drop("_best", "feat_tokens")
    )


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
