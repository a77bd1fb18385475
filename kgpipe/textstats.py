"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, n-gram language-ID, document
fingerprinting. All pure column expressions (whole-stage codegen; no
Python in the hot path) over a `documents`-shaped table
(doc_id, text, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in", "for", "on", "with", "about"]

# tiny deterministic per-language token profiles for the heuristic
# language-ID (real deployments would use char n-gram profiles; the
# operator shape — profile join + argmax — is identical)
LANG_PROFILES = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "mit"],
    "es": ["el", "la", "de", "y", "con"],
    "fr": ["le", "la", "de", "et", "avec"],
    "zh": ["zh0", "zh1", "zh2", "zh3", "zh4"],
}


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("tokens", F.split(F.col(text_col), " "))


def token_stats(df: DataFrame) -> DataFrame:
    """Per-doc token counting: total, distinct, mean token length."""
    t = with_tokens(df)
    return t.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_distinct"),
        F.round(
            F.aggregate("tokens", F.lit(0.0),
                        lambda acc, x: acc + F.length(x)) / F.size("tokens"),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(df: DataFrame) -> DataFrame:
    """Heuristic document quality: stopword ratio, repetition ratio,
    length band — the standard pretraining-corpus filters (C4/Gopher
    style), as one JVM-side expression."""
    t = with_tokens(df)
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_cnt = F.size(F.array_intersect(F.array_distinct("tokens"), sw))
    n = F.size("tokens")
    distinct_ratio = F.size(F.array_distinct("tokens")) / n
    stop_ratio = (
        F.size(F.filter("tokens", lambda x: F.array_contains(sw, x))) / n
    )
    return t.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        stop_cnt.alias("n_stopword_types"),
        F.round(
            F.lit(0.4) * distinct_ratio
            + F.lit(0.3) * stop_ratio
            + F.lit(0.3) * F.least(n / F.lit(200.0), F.lit(1.0)),
            6,
        ).alias("quality"),
    )


def predict_language(df: DataFrame) -> DataFrame:
    """Heuristic language-ID: per-language profile hit count, argmax with
    deterministic tiebreak (score desc, lang asc)."""
    t = with_tokens(df)
    structs = []
    for lang in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        score = F.expr(f"size(filter(tokens, x -> x IN ({words})))")
        structs.append(F.struct((-score).alias("neg"), F.lit(lang).alias("lang")))
    best = F.array_min(F.array(*structs))
    return t.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        best["lang"].alias("pred_lang"),
        (-best["neg"]).cast("int").alias("profile_hits"),
    )


def fingerprint(df: DataFrame, token_ids: DataFrame, modulus: int = 2147483647) -> DataFrame:
    """Order-sensitive document fingerprint: Σ pos·token_id mod m.
    `token_ids` = (token, token_id) dim (see `build_token_ids`)."""
    t = with_tokens(df).select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    )
    joined = t.join(F.broadcast(token_ids), "token", "left").withColumn(
        "tid", F.coalesce("token_id", F.lit(0))
    )
    return joined.groupBy("doc_id").agg(
        F.pmod(
            F.sum((F.col("pos") + 1) * F.col("tid")), F.lit(modulus)
        ).cast("long").alias("fingerprint")
    )


def build_token_ids(df: DataFrame) -> DataFrame:
    """Global token dictionary: dense ids by (count desc, token asc) —
    deterministic, reproducible in plain SQL (the vocabulary analog of
    the reference's alias dictionaries)."""
    counts = (
        with_tokens(df)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return counts.withColumn("token_id", F.row_number().over(w)).select(
        "token", "token_id", "cnt"
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event sessionization (window/lag family): new session when the
    per-user gap exceeds `gap_minutes`. Returns per-user session counts."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet carries TIMESTAMP_NTZ: go through timestamp (session UTC)
    # to epoch seconds, matching DuckDB's epoch()
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )
