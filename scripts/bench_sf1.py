"""sf1.0 bench leg (round-5 verdict item 3): run the 5 heaviest bench
queries — q25 (the flagship KG pipeline, 42% of the sf0.1 bench) plus
the next-heaviest q42/q29/q46/q24 — on a deterministic 10x scale-up of
the sf0.1 input (scripts/gen_sf_scale.py), so the plans carrying the
100x-scale claims get a measured 10x data point instead of prose.

Two phases:
1. bench.py (same interleaved-trials + load-probe protocol as the
   sf0.1 record) restricted to the heavy subset via
   KGPIPE_BENCH_QUERIES, at SPARK_GRAFT_SF_DIR=<scaled dir>.
2. q25 alone in a fresh session with the Spark event log enabled,
   summarized into a stage decomposition (scripts/eventlog_summary.py)
   — is the 10x q25 shuffle-bound or overhead-bound?

Writes BENCH/LOCAL_sf1_r6.json. Usage:
  python scripts/bench_sf1.py [K] [trials]
"""

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
TRIALS = sys.argv[2] if len(sys.argv) > 2 else "3"
DATA_DIR = f"/tmp/kgs_sf{K // 10}" if K % 10 == 0 else f"/tmp/kgs_sfx{K}"
HEAVY = ("q25_kg_triples,q42_lsh_multitable,q29_lsh_cosine_verify,"
         "q46_ivf_topk,q24_span_mentions")
EV_DIR = "/tmp/kgs_sf1_eventlog"


def main():
    if not os.path.exists(f"{DATA_DIR}/documents.parquet"):
        subprocess.run([sys.executable,
                        str(REPO / "scripts/gen_sf_scale.py"),
                        str(K), DATA_DIR], check=True)

    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": DATA_DIR,
           "KGPIPE_BENCH_QUERIES": HEAVY,
           "KGPIPE_BENCH_TRIALS": TRIALS}
    out = subprocess.run([sys.executable, str(REPO / "bench.py")],
                         capture_output=True, text=True, env=env)
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        raise RuntimeError(f"bench.py failed rc={out.returncode}")
    bench = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1])

    # phase 2: q25 alone, fresh session, event log on → stage decomp
    shutil.rmtree(EV_DIR, ignore_errors=True)
    os.makedirs(EV_DIR, exist_ok=True)
    worker = f"""
import sys, time, json
sys.path.insert(0, {str(REPO)!r})
from kgpipe.session import get_spark
import __spark_entry__ as m
spark = get_spark("kgpipe-sf1-q25", extra_conf={{
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": {EV_DIR!r},
    "spark.eventLog.compress": "false",
}})
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
n = m.queries()["q25_kg_triples"](spark, {DATA_DIR!r}).count()
print(json.dumps({{"rows": n, "seconds": round(time.time() - t0, 3)}}))
spark.stop()
"""
    out2 = subprocess.run([sys.executable, "-c", worker],
                          capture_output=True, text=True)
    if out2.returncode != 0:
        raise RuntimeError(f"q25 eventlog run failed:\n{out2.stderr[-2000:]}")
    q25_run = json.loads(
        [l for l in out2.stdout.splitlines() if l.startswith("{")][-1])

    from eventlog_summary import summarize

    # Spark may write the log as a single file or, with rolling enabled
    # (the eventlog-v2 layout), as a directory of events_N_* part
    # files. Pick the NEWEST app, then feed summarize() every part of
    # that app in sequence order — summarizing only the newest part
    # would silently drop the stages recorded in earlier parts.
    logs = [p for p in Path(EV_DIR).rglob("*")
            if p.is_file() and not p.name.startswith("appstatus")]
    stage_summary = {}
    if logs:
        newest = max(logs, key=lambda p: p.stat().st_mtime)
        if newest.name.startswith("events_"):
            parts = sorted(
                (p for p in newest.parent.iterdir()
                 if p.is_file() and p.name.startswith("events_")),
                key=lambda p: int(p.name.split("_")[1]))
            import tempfile
            with tempfile.NamedTemporaryFile(
                    "wb", suffix=".events", delete=False) as tf:
                for p in parts:
                    tf.write(p.read_bytes())
            stage_summary = summarize(tf.name)
        else:
            stage_summary = summarize(str(newest))

    result = {
        "metric": "heavy_queries_sf1",
        "scale_factor_equiv": K * 0.1,
        "data_dir": DATA_DIR,
        "bench": bench,
        "q25_solo_eventlog_run": q25_run,
        "q25_stage_decomposition": stage_summary,
    }
    with open(REPO / "BENCH" / "LOCAL_sf1_r6.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("metric", "scale_factor_equiv", "q25_solo_eventlog_run")}))
    print(json.dumps(bench))


if __name__ == "__main__":
    main()
