"""Mention detection: W1 ordering, boundary tagging, Q1 span grouping,
Q2 context marking (SURVEY.md §2.3, §2.6).

The reference's stage 1 is an XLM-R token classifier emitting
B-ENTITY/I-ENTITY/O (TokenClassification/run_tokenclass.py); this
sandbox has no GPU/model, so the tagger is a deterministic gazetteer
matcher with the *identical I/O contract*: (words) → BIO tags. The
downstream dataflow (span grouping per run_genre.py:77-128, marking per
run_genre.py:203-213) is exactly the reference's.

Scale notes: the tagger and span parser are Arrow-batched pandas UDFs
keyed only on the row itself (no shuffle); the gazetteer is a broadcast
dict; marking is a JVM-side column expression (whole-stage codegen).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

from kgpipe.tags import FINE2GENERAL, rewrite_labels

SPAN_SCHEMA = ArrayType(StructType([
    StructField("text", StringType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("fine_cat", StringType()),
    StructField("general_cat", StringType()),
]))


# gazetteer dims below this many DISTINCT surfaces get the broadcast
# hint in detect_mentions_join; larger sets are left to AQE
BROADCAST_MAX_SURFACES = 2_000_000


def with_turn_order(transcripts: DataFrame) -> DataFrame:
    """W1 stable turn ordering + ingest dedup (FIXTURES.md edge case 10).

    Duplicate (conv_id, turn_idx) rows are dropped deterministically
    (keep min ts, then min text) so the sequential-id invariant of the
    reference's file-order enumeration (run_genre.py:179-187) holds.
    """
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").asc_nulls_last(), F.col("text").asc()
    )
    deduped = (
        transcripts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    order_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return deduped.withColumn("turn_order", F.row_number().over(order_w) - F.lit(1))


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization + per-turn text-equality invariant
    (input_hint; mirrors the reference's length asserts,
    preprocess_MultiCoNER2.py:85-101)."""
    out = df.withColumn("tokens", F.split(F.col(text_col), " "))
    return out.withColumn(
        "text_roundtrip_ok", F.concat_ws(" ", F.col("tokens")) == F.col(text_col)
    )


def assert_text_equality(df: DataFrame) -> None:
    bad = df.filter(~F.col("text_roundtrip_ok")).count()
    if bad:
        raise AssertionError(f"{bad} turns violate per-turn text equality")


# ------------------------------------------------------------ gazetteer

def build_gazetteer(surfaces: List[str]) -> Dict[str, List[Tuple[str, ...]]]:
    """first-token → candidate token tuples, longest first (deterministic
    greedy longest-match)."""
    gaz: Dict[str, List[Tuple[str, ...]]] = {}
    for s in sorted(set(surfaces)):
        toks = tuple(s.split(" "))
        gaz.setdefault(toks[0], []).append(toks)
    for k in gaz:
        gaz[k].sort(key=lambda t: (-len(t), t))
    return gaz


def _tag_tokens(tokens: List[str], gaz) -> List[str]:
    tags = ["O"] * len(tokens)
    i = 0
    while i < len(tokens):
        hit = None
        for cand in gaz.get(tokens[i], ()):
            if tuple(tokens[i:i + len(cand)]) == cand:
                hit = cand
                break
        if hit:
            tags[i] = "B-ENTITY"
            for j in range(i + 1, i + len(hit)):
                tags[j] = "I-ENTITY"
            i += len(hit)
        else:
            i += 1
    return tags


def gazetteer_tagger_udf(surfaces: List[str]):
    """Deterministic stage-1 stand-in (same contract as the XLM-R
    tagger + 5-seed vote: tokens → IOB2 boundary tags).

    The gazetteer ships as a SparkContext broadcast variable — ONE
    executor-side copy fetched on first use — never as a UDF closure
    capture (which would pickle the whole dict into every task)."""
    from pyspark.sql import SparkSession

    sc = SparkSession.getActiveSession().sparkContext
    bc = sc.broadcast(build_gazetteer(surfaces))

    @F.pandas_udf(ArrayType(StringType()))
    def tag(tokens: pd.Series) -> pd.Series:
        gaz = bc.value
        return tokens.map(lambda t: _tag_tokens(list(t), gaz))

    return tag


# --------------------------------------------------------- span grouping

def group_spans(tokens: List[str], tags: List[str]) -> List[dict]:
    """Q1 BIO span grouping, matching run_genre.py:77-128 semantics:
    a span opens at B-, extends over I-, closes at O/B-/EOS; entity ids
    are the in-turn enumeration order. Tags are IOB2-normalized first
    (the reference assumes IOB2 input; orphan I- becomes B-)."""
    tags = rewrite_labels(list(tags), "iob2")
    spans: List[dict] = []
    cur: List[str] = []
    cur_start = -1
    cur_cat = ""

    def flush(end: int):
        if cur:
            fine = cur_cat
            general = "ENTITY" if fine == "ENTITY" else FINE2GENERAL.get(fine, "ENTITY")
            spans.append({
                "text": " ".join(cur), "start": cur_start, "end": end,
                "fine_cat": fine, "general_cat": general,
            })

    for i, (tok, tag) in enumerate(zip(tokens, tags)):
        if (tag.startswith("B-") or tag == "O") and cur:
            flush(i)
            cur, cur_start, cur_cat = [], -1, ""
        if tag.startswith("B-"):
            cur = [tok]
            cur_start = i
            cur_cat = tag[2:]
        elif tag.startswith("I-"):
            cur.append(tok)
    flush(len(tokens))
    return spans


@F.pandas_udf(SPAN_SCHEMA)
def group_spans_udf(tokens: pd.Series, tags: pd.Series) -> pd.Series:
    return pd.Series([
        group_spans(list(tk), list(tg)) for tk, tg in zip(tokens, tags)
    ])


def detect_mentions(turns: DataFrame, surfaces: List[str] | None = None,
                    tags_col: str | None = None) -> DataFrame:
    """transcripts(+tokens) → one row per mention with marked context.

    Either tag with the gazetteer (surfaces) or consume provided gold
    tags (tags_col). Output columns: conv_id, turn_idx, entity_id,
    mention_id, text, start, end, fine_cat, general_cat, tokens,
    marked_text.
    """
    if tags_col is None:
        if surfaces is None:
            raise ValueError("need surfaces or tags_col")
        turns = turns.withColumn("tags", gazetteer_tagger_udf(surfaces)(F.col("tokens")))
        tags_col = "tags"

    spans = turns.withColumn("spans", group_spans_udf(F.col("tokens"), F.col(tags_col)))
    m = (
        spans.select(
            "conv_id", "turn_idx", "tokens",
            F.posexplode("spans").alias("entity_id", "span"),
        )
        .select(
            "conv_id", "turn_idx", "entity_id", "tokens",
            F.col("span.text").alias("text"),
            F.col("span.start").alias("start"),
            F.col("span.end").alias("end"),
            F.col("span.fine_cat").alias("fine_cat"),
            F.col("span.general_cat").alias("general_cat"),
        )
        .withColumn(
            "mention_id",
            F.concat_ws("/", F.col("conv_id"), F.col("turn_idx"), F.col("entity_id")),
        )
    )
    # Q2 [START]/[END] marking as pure column exprs (run_genre.py:203-213)
    return m.withColumn(
        "marked_text",
        F.concat_ws(
            " ",
            F.concat(
                F.expr("slice(tokens, 1, start)"),
                F.array(F.lit("[START]")),
                F.expr("slice(tokens, start + 1, end - start)"),
                F.array(F.lit("[END]")),
                F.expr("slice(tokens, end + 1, size(tokens) - end)"),
            ),
        ),
    )


def detect_mentions_join(turns: DataFrame, surfaces_df: DataFrame,
                         surface_col: str = "surface",
                         broadcast_dim: bool | None = None,
                         broadcast_max_surfaces: int | None = None) -> DataFrame:
    """Fully-distributed gazetteer tagging: same output as
    detect_mentions(surfaces=...), but the surface universe stays a
    DataFrame end-to-end — no driver-side collect, no dict broadcast.
    This is the scale path for KB-sized gazetteers (10⁷–10⁸ surfaces).

    Plan: posexplode turn tokens → broadcast-join the surface dim on
    the first surface token (prunes to candidate starts) → verify the
    full token slice as a column expression → per-turn greedy
    longest-match resolution (matches sorted by (start asc, len desc),
    folded left-to-right: accept iff start ≥ previous accepted end —
    exactly the _tag_tokens scan order). The only shuffle is the
    per-turn groupBy, keyed on (conv_id, turn_idx).

    Broadcast policy: gazetteer-sized dims join fastest broadcast, but a
    KB-sized surface set (10⁷–10⁸ rows) must NOT be force-broadcast — it
    would OOM driver and executors. `broadcast_dim=None` (default)
    probes the DISTINCT surface count (what is actually broadcast — a
    duplicated-but-small gazetteer must not lose the hint) with a
    short-circuiting limit scan and hints broadcast only below
    `broadcast_max_surfaces`; above it the join is left to
    AQE/autoBroadcastJoinThreshold (shuffle hash join on `_first_tok`
    at KB scale). The probe costs one Spark job per call — repeated
    callers should decide once and pass True/False (build_dims derives
    the decision for free via an Observation on the dim materialization
    and run_pipeline threads it through).
    """
    if broadcast_max_surfaces is None:
        broadcast_max_surfaces = BROADCAST_MAX_SURFACES
    if broadcast_dim is None:
        broadcast_dim = (
            surfaces_df.select(surface_col).distinct()
            .limit(broadcast_max_surfaces + 1).count()
            <= broadcast_max_surfaces
        )
    dim = (
        surfaces_df.select(F.split(F.col(surface_col), " ").alias("s_toks"))
        .distinct()
        .select(
            "s_toks",
            F.col("s_toks")[0].alias("_first_tok"),
            F.size("s_toks").alias("s_len"),
        )
    )
    if broadcast_dim:
        dim = F.broadcast(dim)
    cand = (
        turns.select(
            "conv_id", "turn_idx", "tokens",
            F.posexplode("tokens").alias("pos", "_first_tok"),
        )
        .join(dim, "_first_tok")
        .filter(F.expr("slice(tokens, pos + 1, s_len) = s_toks"))
        .select("conv_id", "turn_idx", "pos", "s_len")
    )
    # greedy longest-match fold per turn (deterministic: start asc,
    # len desc — first match at a position is the longest)
    resolved = (
        cand.groupBy("conv_id", "turn_idx")
        .agg(F.array_sort(F.collect_list(
            F.struct("pos", (-F.col("s_len")).alias("neg_len")))).alias("ms"))
        .withColumn("spans_pos", F.expr(
            "aggregate(ms,"
            " struct(0 as nxt, cast(array() as array<struct<s:int,e:int>>) as acc),"
            " (st, m) -> if(m.pos >= st.nxt,"
            "   struct(m.pos - m.neg_len as nxt,"
            "          array_append(st.acc,"
            "            struct(m.pos as s, m.pos - m.neg_len as e)) as acc),"
            "   st),"
            " st -> st.acc)"
        ))
        .select("conv_id", "turn_idx", "spans_pos")
    )
    m = (
        turns.join(resolved, ["conv_id", "turn_idx"], "inner")
        .select(
            "conv_id", "turn_idx", "tokens",
            F.posexplode("spans_pos").alias("entity_id", "sp"),
        )
        .select(
            "conv_id", "turn_idx", "entity_id", "tokens",
            F.concat_ws(
                " ", F.expr("slice(tokens, sp.s + 1, sp.e - sp.s)")
            ).alias("text"),
            F.col("sp.s").alias("start"),
            F.col("sp.e").alias("end"),
            F.lit("ENTITY").alias("fine_cat"),
            F.lit("ENTITY").alias("general_cat"),
        )
        .withColumn(
            "mention_id",
            F.concat_ws("/", F.col("conv_id"), F.col("turn_idx"), F.col("entity_id")),
        )
    )
    return m.withColumn(
        "marked_text",
        mark_context(F.col("tokens"), F.col("start"), F.col("end")),
    )


def mark_context(tokens_col, start_col, end_col, start_tok="[START]", end_tok="[END]"):
    """Standalone Q2 expression (classification variant uses
    [START_ENT]/[END_ENT] — dataset.py:40-48)."""
    return F.concat_ws(
        " ",
        F.concat(
            F.slice(tokens_col, F.lit(1), start_col),
            F.array(F.lit(start_tok)),
            F.slice(tokens_col, start_col + 1, end_col - start_col),
            F.array(F.lit(end_tok)),
            F.slice(tokens_col, end_col + 1,
                    F.greatest(F.size(tokens_col) - end_col, F.lit(0))),
        ),
    )


def context_window(turns: DataFrame, k: int = 2) -> DataFrame:
    """W4 cross-turn context: ±k turns of text per turn (generalizes the
    reference's single-sentence context, run_genre.py:206-212)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(-k, k)
    return turns.withColumn("context_texts", F.collect_list("text").over(w))
