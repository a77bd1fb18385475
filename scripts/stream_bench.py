"""Streaming throughput measurement for the stateful
conversation_progress operator (SURVEY.md §2.10) at scale — the round-5
verdict's ask: the operator is oracle-verified at sf0.01 (q45); this
measures rows/s and state-store size on the 1.2M-turn scaling corpus
(/tmp/kgs/transcripts, 80k conversations) so the O(live conversations)
state claim is evidenced with numbers, not prose.

Protocol: file-source stream over the pre-generated transcript parquet
(maxFilesPerTrigger throttles it into real micro-batches),
applyInPandasWithState with an idle timeout, noop sink (no driver-side
row accumulation — pure operator throughput). Under
trigger(availableNow=True) the post-drain no-data batches fire every
pending timeout, so every conversation finalizes and its state row is
REMOVED: the recorded per-batch state-store trace must rise to ~n_convs
and fall back to 0, which is exactly the O(live) shape. Poll
StreamingQuery progress (driver-side metadata only) until the store
empties.

Writes BENCH/STREAM_r6.json. Usage:
  python scripts/stream_bench.py [input_dir] [files_per_trigger]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from kgpipe import schemas  # noqa: E402
from kgpipe.session import get_spark  # noqa: E402
from kgpipe.streaming import conversation_progress  # noqa: E402

INPUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/kgs/transcripts"
FILES_PER_TRIGGER = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
IDLE_TIMEOUT_MS = 3_000


def main():
    spark = get_spark("kgpipe-stream-bench", master=f"local[{CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = (spark.read.parquet(INPUT)
               .select("conv_id").distinct().count())

    stream = (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(INPUT)
        .select("conv_id", "turn_idx", "text")
    )
    prog = conversation_progress(stream, idle_timeout_ms=IDLE_TIMEOUT_MS)
    ck = tempfile.mkdtemp(prefix="kgpipe-streambench-ck-")
    t0 = time.time()
    q = (
        prog.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    # drive until the state store has emptied (every conversation timed
    # out, finalized, state removed) — the same drain condition as q45
    # but observed on the operator's own metrics instead of sink rows
    batches: list[dict] = []
    seen_ids = set()
    deadline = time.time() + 1800
    drain_wall = None
    while q.isActive and time.time() < deadline:
        for p in q.recentProgress:
            if p["batchId"] in seen_ids or not p.get("stateOperators"):
                continue
            seen_ids.add(p["batchId"])
            so = p["stateOperators"][0]
            batches.append({
                "batch_id": p["batchId"],
                "input_rows": p["numInputRows"],
                "batch_ms": p["durationMs"]["triggerExecution"],
                "state_rows_total": so["numRowsTotal"],
                "state_rows_updated": so["numRowsUpdated"],
                "state_rows_removed": so["numRowsRemoved"],
                "state_bytes": so.get("stateMemory",
                                      so.get("memoryUsedBytes")),
            })
        data_done = (batches
                     and sum(b["input_rows"] for b in batches) > 0
                     and batches[-1]["input_rows"] == 0)
        if data_done and batches[-1]["state_rows_total"] == 0:
            drain_wall = time.time() - t0
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    if drain_wall is None:
        raise RuntimeError(
            f"state store never drained; last trace: {batches[-3:]}")

    input_rows = sum(b["input_rows"] for b in batches)
    data_batches = [b for b in batches if b["input_rows"] > 0]
    data_ms = sum(b["batch_ms"] for b in data_batches)
    peak_state = max(b["state_rows_total"] for b in batches)
    result = {
        "metric": "stream_conversation_progress",
        "input": INPUT,
        "cpus": int(CPUS),
        "files_per_trigger": FILES_PER_TRIGGER,
        "idle_timeout_ms": IDLE_TIMEOUT_MS,
        "n_conversations": n_convs,
        "input_rows": input_rows,
        "n_micro_batches": len(data_batches),
        "rows_per_sec_data_batches": round(input_rows / (data_ms / 1e3), 1),
        "wall_to_full_drain_sec": round(drain_wall, 2),
        "rows_per_sec_wall": round(input_rows / drain_wall, 1),
        # the O(live conversations) evidence: peaks at <= n_convs tiny
        # fixed-width rows (never O(turns)), then falls to 0 as idle
        # conversations finalize and their state is removed
        "state_rows_peak": peak_state,
        "state_rows_final": batches[-1]["state_rows_total"],
        "state_bytes_peak": max((b["state_bytes"] or 0) for b in batches),
        "batch_trace": batches,
    }
    out = REPO / "BENCH" / "STREAM_r6.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "batch_trace"}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
