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


def emit_triples(classified: DataFrame, materialize: bool = True) -> DataFrame:
    """Single-pass emission: per mention row, build the array of its
    triple structs and explode once — one scan for the (unique-by-
    construction) mention-subject families, one scan + small distinct
    for the QID-subject families. At 10^12 turns the dedup shuffle
    touches only the QID-fact set (bounded by |KB| × languages), never
    the mention-fact stream.

    materialize=True persists a *slim* projection (strings + one small
    struct array — cheap to cache, unlike the wide upstream frames with
    nested maps) so the two family branches don't re-execute the whole
    mention→link→enrich→classify DAG each. Measured ~2× end-to-end."""
    needed = ["mention_id", "conv_id", "turn_idx", "start", "end",
              "link_qid", "pred_label", "accepted_qid",
              "wikidata_summary", "wikipedia_title", "arg_pairs"]
    classified = classified.select(*[c for c in needed if c in classified.columns])
    if materialize:
        classified = classified.persist()
    m_uri = F.concat(F.lit(MENTION_PREFIX), F.col("mention_id"))
    trip = "struct<subj:string,pred:string,obj:string>"

    mention_rows = classified.select(
        F.explode(F.array(
            F.struct(m_uri.alias("subj"), F.lit("links_to").alias("pred"),
                     F.col("link_qid").alias("obj")),
            F.struct(m_uri.alias("subj"), F.lit("has_category").alias("pred"),
                     F.col("pred_label").alias("obj")),
            F.struct(
                m_uri.alias("subj"), F.lit("mentioned_in").alias("pred"),
                F.concat_ws("/", F.col("conv_id"), F.col("turn_idx"),
                            F.col("start"), F.col("end")).alias("obj")),
        )).alias("t")
    ).select("t.subj", "t.pred", "t.obj")

    # PROP2PRED inlined in the transform's CASE below (lambda scope
    # can't reference an outer map literal)
    qid_rows = (
        classified.filter(F.col("accepted_qid").isNotNull())
        .select(
            F.explode(F.concat(
                F.array(
                    F.struct(F.col("accepted_qid").alias("subj"),
                             F.lit("described_as").alias("pred"),
                             F.col("wikidata_summary").alias("obj")),
                    F.struct(F.col("accepted_qid").alias("subj"),
                             F.lit("titled").alias("pred"),
                             F.col("wikipedia_title").alias("obj")),
                ).cast(f"array<{trip}>"),
                F.expr(
                    "transform(arg_pairs, ap -> struct("
                    "accepted_qid as subj,"
                    " case ap.prop when 'P31' then 'instance_of'"
                    " when 'P106' then 'occupation'"
                    " when 'P279' then 'subclass_of' end as pred,"
                    " ap.label as obj))"
                ).cast(f"array<{trip}>"),
            )).alias("t"),
        )
        .select("t.subj", "t.pred", "t.obj")
        .distinct()
    )
    return mention_rows.unionByName(qid_rows)


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
    """Partitioned graph-table sink: partition on the predicate family —
    low cardinality, prunes per-family scans; subjects are
    hash-distributed inside each family via repartition. Format routed
    through kgpipe.io (KGPIPE_TABLE_FORMAT=iceberg on a real cluster,
    parquet fallback in the sandbox — SURVEY.md §7.5.3)."""
    from kgpipe.io import write_table

    df = triples
    if n_files:
        df = df.repartition(n_files, "subj")
    write_table(df, path, partition_by=["pred"])
