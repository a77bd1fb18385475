"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kgpipe/`` (see SURVEY.md §2 operator map);
``kgpipe/driver_queries.py`` binds each operator to the driver's
parquet tables with a DuckDB-oracle twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG-construction pipeline (mention detection →
    candidate generation → linking w/ per-QID marginalization → KB
    acceptance/enrichment → classification → (subj, pred, obj)
    triples) over the sf0.001 transcript stand-in."""
    from kgpipe.driver_queries import q_kg_triples

    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kgpipe.driver_queries import QUERIES, ROWS_ONLY_QUERIES

    out: dict[str, Callable] = {}
    for name, (fn, _sql) in QUERIES.items():
        out[name] = fn
    out.update(ROWS_ONLY_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from kgpipe.driver_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items()}
