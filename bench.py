"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...}.

The headline set covers every operator family: the full KG pipeline
(q25), joins/windows/aggregations (q03/q04/q09/q22/q23), dedup
(q12/q14), similarity (q20), text stats (q17/q18), sessionization (q21).

Measurement protocol (r4, replacing best-of-2): this sandbox host has
multi-x background-load variance between trials (shared box; the r3
record showed untouched pure-expression queries "regressing" 1.2-1.6x
round-over-round purely from neighbor load). So:
- N_TRIALS (default 5) full passes, INTERLEAVED: the trial loop is
  outermost, so one loaded minute taxes every query equally instead of
  sinking whichever query it happened to land on;
- per query we report BOTH the min (engine time - the number that is
  robust to one-sided noise and comparable to the r2/r3 best-of-2
  records) and the median (the typical-load number);
- a memory-bandwidth load probe (numpy streaming sum over a fixed
  buffer) runs before every trial pass and is logged into the JSON:
  probe spread across passes IS the host-load disclosure. The probe
  measures the resource this host saturates first (see
  BENCH/BASELINE.md microbenchmark).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kgpipe.hostload import cpu_jiffies, load_probe_gbps  # noqa: E402
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
    "q42_lsh_multitable",
    "q43_context_window",
    # new in r4: IVF ANN
    "q46_ivf_topk",
]

N_TRIALS = int(os.environ.get("KGPIPE_BENCH_TRIALS", "5"))

# subset override (comma-separated) for scale-point runs that only
# exercise the heavy queries (scripts/bench_sf1.py); default = full set
if os.environ.get("KGPIPE_BENCH_QUERIES"):
    BENCH_QUERIES = [q.strip() for q in
                     os.environ["KGPIPE_BENCH_QUERIES"].split(",") if q.strip()]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    spark = get_spark("kgpipe-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    trials: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    load_probe_gbps()  # discard: first call pays numpy/page-in warmup
    probes: list[float] = []
    rows: dict[str, int] = {}
    t_all = time.time()
    steal_pcts: list[float] = []
    for trial in range(N_TRIALS):
        probes.append(load_probe_gbps())
        steal0, total0 = cpu_jiffies()
        for name in BENCH_QUERIES:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            rows[name] = df.count()
            # release any cache the query handed us (the eager dedup
            # pair queries return cached frames whose unpersist the
            # caller owns; a no-op for everything else) — so trial N+1
            # starts from the same executor-memory state as trial 1
            df.unpersist()
            trials[name].append(time.time() - t0)
        steal1, total1 = cpu_jiffies()
        steal_pcts.append(round(
            100.0 * (steal1 - steal0) / max(1, total1 - total0), 2))
        print(f"# pass {trial + 1}/{N_TRIALS} done "
              f"(probe {probes[-1]} GB/s, steal {steal_pcts[-1]}%)",
              file=sys.stderr)
    probes.append(load_probe_gbps())

    best = {n: round(min(ts), 3) for n, ts in trials.items()}
    med = {n: round(statistics.median(ts), 3) for n, ts in trials.items()}
    total_best = round(sum(best.values()), 3)
    total_med = round(sum(med.values()), 3)

    # load-qualified figure (r6): the r5 record showed identical code on
    # the same day disagreeing 14% purely by which load window the run
    # landed in (27.7 s probe≈5 GB/s vs 31.6 s probe≈0.1 GB/s). So in
    # addition to the raw min/median, report the min over only the
    # passes whose pre-pass bandwidth probe cleared a threshold — a
    # loaded window can then never contaminate the headline comparison.
    # pass i runs between probes[i] (before) and probes[i+1] (after);
    # qualify on the BEFORE sample, matching the per-pass disclosure.
    probe_min = float(os.environ.get("KGPIPE_PROBE_MIN_GBPS", "2.0"))
    qual_passes = [i for i in range(N_TRIALS) if probes[i] >= probe_min]
    probe_qualified = bool(qual_passes)
    if not qual_passes:  # fully-loaded run: fall back to all passes,
        qual_passes = list(range(N_TRIALS))  # flagged via the bool
    loadq = {n: round(min(ts[i] for i in qual_passes), 3)
             for n, ts in trials.items()}
    total_loadq = round(sum(loadq.values()), 3)
    wall = round(time.time() - t_all, 3)
    for name in BENCH_QUERIES:
        print(f"# {name}: {rows[name]} rows; best {best[name]}s "
              f"median {med[name]}s over {N_TRIALS}", file=sys.stderr)

    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total_best,
        "unit": "sec",
        "queries": best,
        "sf": float(sf),
        "cpus": int(cpus),
        # methodology disclosure (r4 protocol): value == sum of
        # per-query MIN over N_TRIALS interleaved passes (comparable to
        # the r2/r3 best-of-2 records; robust to one-sided host noise);
        # queries_median/sum_median are the typical-load numbers;
        # load_probe_gbps (one streaming-bandwidth sample before each
        # pass + one after) discloses background host load during the
        # run - spread there explains spread in the medians
        "sum_best_of_n": total_best,
        "sum_median": total_med,
        "queries_median": med,
        # load-qualified: min over passes whose pre-pass probe >=
        # loadq_threshold_gbps (falls back to all passes, flagged via
        # probe_qualified=false, when every pass ran loaded)
        "sum_loadq": total_loadq,
        "queries_loadq": loadq,
        "loadq_threshold_gbps": probe_min,
        "loadq_passes": len(qual_passes),
        "probe_qualified": probe_qualified,
        "trials_per_query": N_TRIALS,
        "load_probe_gbps": probes,
        # hypervisor steal share over each pass's own wall window (the
        # in-window complement to the point-in-time probes above)
        "steal_pct_per_pass": steal_pcts,
        "wall_seconds": wall,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
