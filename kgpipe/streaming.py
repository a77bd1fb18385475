"""Structured-streaming ingestion (SURVEY.md §2.10 — stretch beyond the
batch-only reference): stream transcript turns, deduplicate within a
watermark, run incremental mention detection per micro-batch, and keep
windowed arrival metrics. The reference's chunk-boundary cache
checkpointing (get_wikidata.py:422-428) maps to foreachBatch writes made
idempotent per batch_id (at-least-once delivery + idempotent effects =
exactly-once results); its filled-field skip (run_genre.py:201-214) maps
to processing only the new rows each micro-batch delivers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgpipe import schemas


def read_transcript_stream(spark: SparkSession, path: str,
                           fmt: str = "parquet",
                           watermark: str = "10 minutes") -> DataFrame:
    """File-source stream of transcript turns with late-data handling:
    watermark on ts + dropDuplicatesWithinWatermark on the ordering key
    (FIXTURES.md edge case 10, streamed)."""
    stream = (
        spark.readStream.format(fmt)
        .schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", 8)
        .load(path)
    )
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )


def turn_rate_metrics(turns: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Event-time windowed arrival metrics (turns + mention-bearing
    turns per window/role)."""
    return (
        turns.groupBy(F.window("ts", window), "role")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        )
    )


def incremental_mentions(turns: DataFrame, surfaces, checkpoint_dir: str,
                         out_path: str):
    """Micro-batch incremental mention detection: each batch runs the
    batch operator (same code path as the pipeline) and writes to the
    mentions table. foreachBatch is only at-least-once, so the write
    must be idempotent per batch_id to get exactly-once *effects*: each
    batch overwrites its own `batch_id=N` subdirectory, so a micro-batch
    retried after a partial write replaces it instead of duplicating
    rows. Readers see batch_id as a partition column of out_path.
    Returns the StreamingQuery (caller awaits/stops)."""
    import os

    from kgpipe.mentions import detect_mentions, tokenize

    def process(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        m = detect_mentions(tokenize(batch_df), surfaces=surfaces)
        m.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    return (
        turns.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
