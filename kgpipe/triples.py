"""Triple materialization + skew-aware aggregation (SURVEY.md §7.2, §4).

Per enriched+classified mention, emit the (subj, pred, obj) families:

  mention:<conv>/<turn>/<eid>  links_to      <accepted qid | Q0>
  <qid>  instance_of|occupation|subclass_of  <arg label>   (accepted only)
  <qid>  described_as  <wikidata_summary>                  (accepted only)
  <qid>  titled        <wikipedia_title>                   (accepted only)
  mention:...  has_category  <pred_label>
  mention:...  mentioned_in  <conv>/<turn>/<start>/<end>

QID-subject families are set-deduplicated (two mentions of the same
entity assert the same fact once) — matching the strong exact-tuple
semantics the P/R metric uses (GENRE/genre/utils.py:284-285).

Skew: head entities dominate the qid-subject families (Zipfian mention
distribution). `salted_subject_counts` shows the two-phase pattern used
for any per-QID aggregate at 10^12-turn scale: pre-aggregate on
(subj, salt) — spreading one hot key over S reducers — then combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgpipe.schemas import PROP2PRED

MENTION_PREFIX = "mention:"


def emit_triples(classified: DataFrame) -> DataFrame:
    m_uri = F.concat(F.lit(MENTION_PREFIX), F.col("mention_id"))
    accepted = classified.filter(F.col("accepted_qid").isNotNull())

    links = classified.select(
        m_uri.alias("subj"), F.lit("links_to").alias("pred"),
        F.col("link_qid").alias("obj"),
    )

    prop_pred = F.create_map(*[
        x for p, name in PROP2PRED.items() for x in (F.lit(p), F.lit(name))
    ])
    args = (
        accepted.select(
            F.col("accepted_qid").alias("subj"),
            F.explode("arg_pairs").alias("ap"),
        )
        .select(
            "subj",
            F.element_at(prop_pred, F.col("ap.prop")).alias("pred"),
            F.col("ap.label").alias("obj"),
        )
        .distinct()
    )

    described = accepted.select(
        F.col("accepted_qid").alias("subj"), F.lit("described_as").alias("pred"),
        F.col("wikidata_summary").alias("obj"),
    ).distinct()

    titled = accepted.select(
        F.col("accepted_qid").alias("subj"), F.lit("titled").alias("pred"),
        F.col("wikipedia_title").alias("obj"),
    ).distinct()

    category = classified.select(
        m_uri.alias("subj"), F.lit("has_category").alias("pred"),
        F.col("pred_label").alias("obj"),
    )

    mentioned = classified.select(
        m_uri.alias("subj"), F.lit("mentioned_in").alias("pred"),
        F.concat_ws(
            "/", F.col("conv_id"), F.col("turn_idx"), F.col("start"), F.col("end")
        ).alias("obj"),
    )

    return (
        links.unionByName(args).unionByName(described)
        .unionByName(titled).unionByName(category).unionByName(mentioned)
    )


def salted_subject_counts(triples: DataFrame, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-tamed count per subject: phase 1 aggregates on
    (subj, salt) so a head QID fans out over n_salts reducers; phase 2
    combines the ≤n_salts partials. Equivalent to groupBy(subj).count()
    but bounded per-reducer load under Zipfian subjects (SURVEY.md §4)."""
    salted = triples.withColumn(
        "salt", F.pmod(F.xxhash64("pred", "obj"), F.lit(n_salts))
    )
    partial = salted.groupBy("subj", "salt").agg(F.count("*").alias("c"))
    return partial.groupBy("subj").agg(F.sum("c").alias("n_triples"))


def write_triples(triples: DataFrame, path: str, n_files: int | None = None) -> None:
    """Partitioned parquet sink (Iceberg-shaped layout: partition on the
    predicate family — low cardinality, prunes per-family scans; subjects
    are hash-distributed inside each family via repartition)."""
    df = triples
    if n_files:
        df = df.repartition(n_files, "subj")
    df.write.mode("overwrite").partitionBy("pred").parquet(path)
