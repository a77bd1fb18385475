"""End-to-end KG construction pipeline (SURVEY.md §3 lifecycles recast).

transcripts → W1 order/dedup → tokenize (+text-equality invariant) →
gazetteer tag → Q1 spans → Q2 marking → J5 candidates → scoring +
A1 marginalization → J7 acceptance + J6 enrichment → classification →
(subj, pred, obj) triples.

Every stage takes/returns DataFrames; `run_pipeline` optionally
checkpoints each stage for idempotent resume (checkpoints.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe import checkpoints
from kgpipe.candidates import attach_candidates, generate_candidates  # noqa: F401
from kgpipe.classify import classify
from kgpipe.enrich import accept_and_enrich
from kgpipe.kb import build_alias_map, build_kb_context, build_title_map
from kgpipe.linking import link_mentions, link_mentions_fast  # noqa: F401
from kgpipe.mentions import assert_text_equality, detect_mentions, tokenize, with_turn_order
from kgpipe.triples import emit_triples


def surfaces_from_dims(alias_map: DataFrame, mention_counts: DataFrame) -> list:
    """Gazetteer surface universe = known mention surface forms (the
    stand-in tagger's 'training data'): alias map ∪ mention_counts keys."""
    a = alias_map.select(F.col("alias_lc").alias("s"))
    b = mention_counts.select(F.col("mention").alias("s"))
    return [r["s"] for r in a.unionByName(b).distinct().collect()]


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    entity_kb: DataFrame,
    kb_args: DataFrame,
    mention_counts: DataFrame,
    wiki_summaries: DataFrame,
    language: str = "en",
    checkpoint_dir: str | None = None,
    check_invariants: bool = True,
    beam: int = 8,
    max_candidates: int = 8,
) -> dict:
    """Returns dict of stage DataFrames: turns, mentions, candidates,
    linked, enriched, classified, triples."""
    title_map = build_title_map(entity_kb)
    alias_map = build_alias_map(entity_kb)
    kb_context = build_kb_context(entity_kb, kb_args)
    surfaces = surfaces_from_dims(alias_map, mention_counts)

    turns = tokenize(with_turn_order(transcripts))
    if check_invariants:
        assert_text_equality(turns)

    def stage_mentions(t: DataFrame) -> DataFrame:
        return detect_mentions(t, surfaces=surfaces)

    def stage_link(m: DataFrame) -> DataFrame:
        return link_mentions_fast(
            m, mention_counts, title_map, beam=beam,
            max_candidates=max_candidates,
        )

    def stage_enrich(l: DataFrame) -> DataFrame:
        return accept_and_enrich(l, kb_context, wiki_summaries, language=language)

    if checkpoint_dir:
        mentions = checkpoints.resume_stage(
            turns.withColumn(
                "mention_id", F.concat_ws("/", "conv_id", "turn_idx")
            ).drop("mention_id"),
            os.path.join(checkpoint_dir, "mentions"), "mentions", stage_mentions,
            key="conv_id",
        )
        linked = checkpoints.resume_stage(
            mentions, os.path.join(checkpoint_dir, "linked"), "linked", stage_link
        )
        enriched = checkpoints.resume_stage(
            linked, os.path.join(checkpoint_dir, "enriched"), "enriched", stage_enrich
        )
    else:
        # No .persist() here: the triple union fans the plan out 6×,
        # but Catalyst dedupes identical subplans via ReusedExchange,
        # which measured ~4× faster than caching (InMemoryRelation on
        # nested array/map columns is expensive and blocks AQE). On a
        # cluster, per-stage checkpoint tables (checkpoint_dir path)
        # provide durable stage cuts instead.
        mentions = stage_mentions(turns)
        linked = stage_link(mentions)
        enriched = stage_enrich(linked)

    classified = classify(enriched)
    triples = emit_triples(classified)
    return {
        "turns": turns,
        "mentions": mentions,
        "linked": linked,
        "enriched": enriched,
        "classified": classified,
        "triples": triples,
        "dims": {
            "title_map": title_map,
            "alias_map": alias_map,
            "kb_context": kb_context,
        },
    }
