"""Table IO with a single format switch (SURVEY.md §7.5.3).

The production design targets Iceberg tables (north_rule: "partitioned
Iceberg graph table"); the sandbox has no Iceberg runtime jar, so the
default is parquet with the same layout. One knob switches every stage
write/read in the engine:

    KGPIPE_TABLE_FORMAT=iceberg   (env var), or
    kgpipe.io.set_table_format("iceberg")

When the configured format's data source is not loadable (e.g. the
iceberg-spark-runtime jar is absent) the write falls back to parquet and
records that in `last_fallback` so callers/tests can assert on it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_FORMAT: str | None = None  # None → env var → default "parquet"
last_fallback: str | None = None


def table_format() -> str:
    if _FORMAT is not None:
        return _FORMAT
    return os.environ.get("KGPIPE_TABLE_FORMAT", "parquet")


def set_table_format(fmt: str | None) -> None:
    global _FORMAT
    _FORMAT = fmt


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """Write df via the configured format; parquet fallback when the
    format's data source is unavailable in this runtime."""
    global last_fallback
    fmt = table_format()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "parquet":
        writer.parquet(path)
        return
    try:
        writer.format(fmt).save(path)
        last_fallback = None
    except Exception as e:  # data source missing → parquet fallback
        if "ClassNotFound" not in str(e) and "Failed to find" not in str(e):
            raise
        last_fallback = f"{fmt}: {type(e).__name__}"
        writer.parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    fmt = table_format()
    if fmt == "parquet" or last_fallback is not None:
        return spark.read.parquet(path)
    try:
        return spark.read.format(fmt).load(path)
    except Exception:
        return spark.read.parquet(path)
