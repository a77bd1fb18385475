"""Per-stage checkpointing with anti-join resume + lineage metrics
(SURVEY.md §2.4 J9, §2.1 S10; reference resume semantics at
run_genre.py:201-214 and get_wikidata.py:303-321).

A stage writes its output keyed by `mention_id` (or any key). On rerun,
the work set is anti-joined against the checkpoint, only misses are
computed, and the union is rewritten — the reference's
"skip rows whose field is already filled" as a relational plan.
Each commit records a lineage manifest (stage, row count, per-partition
row counts — the A13-style data-quality metric) next to the parquet.

Iceberg note: the sandbox has no Iceberg runtime jar, so checkpoints are
parquet + manifest JSON with the same layout; swap `_write`/`_read` for
`format("iceberg")` + MERGE INTO on a real cluster (one switch,
SURVEY.md §7.5.3).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_kgpipe_manifest.json")


def partition_metrics(df: DataFrame) -> list:
    """Per-partition row counts (lineage metric, north_rule)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return [{"partition": r["pid"], "rows": r["count"]} for r in rows]


def commit_stage(df: DataFrame, path: str, stage: str,
                 with_partition_metrics: bool = True) -> dict:
    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    written = spark.read.parquet(path)
    manifest = {
        "stage": stage,
        "path": path,
        "rows": written.count(),
        "committed_at": time.time(),
        "schema": written.schema.simpleString(),
    }
    if with_partition_metrics:
        manifest["partitions"] = partition_metrics(written)
    with open(_manifest_path(path), "w", encoding="utf8") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_stage(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def resume_stage(
    work: DataFrame,
    checkpoint_path: str,
    stage: str,
    compute,
    key: str = "mention_id",
) -> DataFrame:
    """Idempotent stage execution: compute(work \\ done) ∪ done.

    `compute` maps the pending subset to the stage output. Completed
    keys are never recomputed (anti-join), so a killed run restarts
    where it stopped — J9.
    """
    spark = work.sparkSession
    done = load_stage(spark, checkpoint_path)
    if done is None:
        out = compute(work)
        commit_stage(out, checkpoint_path, stage)
        return spark.read.parquet(checkpoint_path)

    pending = work.join(done.select(key).distinct(), key, "left_anti")
    if pending.isEmpty():
        return done
    fresh = compute(pending)
    merged = done.unionByName(fresh, allowMissingColumns=True)
    commit_stage(merged, checkpoint_path + ".tmp", stage)
    spark_df = spark.read.parquet(checkpoint_path + ".tmp")
    spark_df.write.mode("overwrite").parquet(checkpoint_path)
    commit_stage(spark.read.parquet(checkpoint_path), checkpoint_path, stage)
    return spark.read.parquet(checkpoint_path)
