"""One pipeline measurement: (cores, cut_mode, skip_cuts) on
pre-generated input at /tmp/kgs (generate with scripts/gen_input.py).
Prints one JSON line. Fresh process per run (a JVM binds its master
once). Optional event log via KGPIPE_EVENTLOG_DIR."""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

cores = int(sys.argv[1])
mode = sys.argv[2] if len(sys.argv) > 2 else "parquet"
skips = tuple(s for s in sys.argv[3].split(",") if s) if len(sys.argv) > 3 else ()

os.environ.setdefault("KGPIPE_DRIVER_MEM", "12g")

from kgpipe.session import get_spark  # noqa: E402

extra = {}
ev_dir = os.environ.get("KGPIPE_EVENTLOG_DIR")
if ev_dir:
    os.makedirs(ev_dir, exist_ok=True)
    extra = {"spark.eventLog.enabled": "true", "spark.eventLog.dir": ev_dir}

spark = get_spark(f"cut-{cores}-{mode}", master=f"local[{cores}]",
                  shuffle_partitions=max(8, 2 * cores), extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")

from kgpipe.pipeline import build_dims, run_pipeline  # noqa: E402

tr = spark.read.parquet("/tmp/kgs/transcripts")
kb = spark.read.parquet("/tmp/kgs/entity_kb")
args_df = spark.read.parquet("/tmp/kgs/kb_args")
mc = spark.read.parquet("/tmp/kgs/mention_counts")
ws = spark.read.parquet("/tmp/kgs/wiki_summaries")

dims = build_dims(spark, kb, args_df, mc)
n_turns = tr.count()

t0 = time.time()
res = run_pipeline(spark, tr, kb, args_df, mc, ws, language="en",
                   check_invariants=False, dims=dims,
                   cut_mode=mode, skip_cuts=skips)
n_triples = res["triples"].count()
dt = time.time() - t0

print(json.dumps({
    "cores": cores, "mode": mode, "skips": list(skips),
    "turns": n_turns, "triples": n_triples,
    "seconds": round(dt, 2), "turns_per_sec": round(n_turns / dt, 1),
    "app_id": spark.sparkContext.applicationId,
}))
spark.stop()
