"""One multi-executor scaling measurement: run the full KG pipeline on
pre-generated input (/tmp/kgs) against a LOCAL SPARK STANDALONE cluster
(separate master + worker JVMs — scripts/run_standalone_scaling.py
starts them), requesting `cores_max` total cores at a fixed
executor shape (8 cores / 3g each). cores.max=8 → 1 executor (the N
leg); cores.max=32 → 4 executors (the 4N leg): the north_rule's
two-cluster-size criterion with per-executor resources held constant.

The kgpipe package ships to executors as a zip via addPyFile — the
spark-submit --py-files contract (north_rule) — NOT via a shared
PYTHONPATH, so the run is faithful to a real multi-node submit.

Prints one JSON line. Fresh process per leg (a JVM binds its master
once). Optional event log via KGPIPE_EVENTLOG_DIR."""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

cores_max = int(sys.argv[1])
executor_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
executor_mem = sys.argv[3] if len(sys.argv) > 3 else "3g"
n_exec_expected = cores_max // executor_cores
INPUT_DIR = os.environ.get("KGPIPE_INPUT_DIR", "/tmp/kgs")

from kgpipe.session import get_spark  # noqa: E402

cut_mode = os.environ.get("KGPIPE_CUT_MODE", "parquet")
extra = {
    "spark.executor.cores": str(executor_cores),
    "spark.executor.memory": executor_mem,
    "spark.cores.max": str(cores_max),
    "spark.driver.host": "127.0.0.1",
    # executors run the same interpreter as the driver
    "spark.pyspark.python": sys.executable,
    # NOTE: do NOT zero locality.wait here — with cached/checkpointed
    # blocks pinned on executors, ANY-locality scheduling turns every
    # downstream read into a remote block fetch (measured: the 4N leg
    # ran SLOWER than N under locality.wait=0 + localCheckpoint cuts)
    "spark.locality.wait": os.environ.get("KGPIPE_LOCALITY_WAIT", "3s"),
    "spark.ui.showConsoleProgress": "false",
}
ev_dir = os.environ.get("KGPIPE_EVENTLOG_DIR")
if ev_dir:
    os.makedirs(ev_dir, exist_ok=True)
    extra.update({"spark.eventLog.enabled": "true",
                  "spark.eventLog.dir": ev_dir,
                  # plain JSON lines (no zstd) so the driver-side
                  # parser in run_standalone_scaling.py can read them
                  "spark.eventLog.compress": "false",
                  "spark.eventLog.rolling.enabled": "false"})

os.environ.setdefault("KGPIPE_DRIVER_MEM", "4g")  # constant across legs
# Default scales shuffle width with cores, which gives the two legs
# DIFFERENT physical plans (8 vs 16 partitions at 2->8 cores) — the
# deliberate protocol choice: the A/B in BENCH/AB_PARTS_r6.json
# measured pinning either leg to the other's width as a ≤0.02 effect,
# and a real 4× cluster would scale its width too. For a constant-plan
# variant set KGPIPE_SHUFFLE_PARTS explicitly; the run record
# discloses the resolved per-leg widths either way.
shuffle_parts = int(os.environ.get("KGPIPE_SHUFFLE_PARTS",
                                   max(8, 2 * cores_max)))
spark = get_spark(f"standalone-{cores_max}",
                  master=os.environ.get("KGPIPE_STANDALONE_MASTER",
                                        "spark://127.0.0.1:7077"),
                  shuffle_partitions=shuffle_parts,
                  extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")

# --py-files contract: executors import kgpipe from the shipped zip
pyzip = "/tmp/kgs/kgpipe.zip"
if os.path.exists(pyzip):
    spark.sparkContext.addPyFile(pyzip)

# wait for the requested executors to register so the timed window
# measures the engine, not executor spin-up (both legs get the same
# treatment; spin-up is ~2-4s either way)
deadline = time.time() + 90
while time.time() < deadline:
    n_up = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    if n_up >= n_exec_expected:
        break
    time.sleep(0.5)
n_up = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

from kgpipe.pipeline import build_dims, run_pipeline  # noqa: E402

tr = spark.read.parquet(INPUT_DIR + "/transcripts")
kb = spark.read.parquet(INPUT_DIR + "/entity_kb")
args_df = spark.read.parquet(INPUT_DIR + "/kb_args")
mc = spark.read.parquet(INPUT_DIR + "/mention_counts")
ws = spark.read.parquet(INPUT_DIR + "/wiki_summaries")

dims = build_dims(spark, kb, args_df, mc, wiki_summaries=ws)
n_turns = tr.count()

t0 = time.time()
res = run_pipeline(spark, tr, kb, args_df, mc, ws, language="en",
                   check_invariants=False, dims=dims, cut_mode=cut_mode)
n_triples = res["triples"].count()
dt = time.time() - t0

print(json.dumps({
    "cores_max": cores_max, "executors": n_up, "cut_mode": cut_mode,
    "executor_cores": executor_cores, "executor_mem": executor_mem,
    "turns": n_turns, "triples": n_triples,
    "seconds": round(dt, 2), "turns_per_sec": round(n_turns / dt, 1),
    "app_id": spark.sparkContext.applicationId,
}))
spark.stop()
