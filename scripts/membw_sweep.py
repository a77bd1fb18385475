"""Aggregate memory-bandwidth sweep vs thread count — the quantitative
ceiling evidence behind the round-6 scaling record.

Round-6 finding: on a QUIET host (per-leg probes 8-9.6 GB/s), the
1-executor x 8-core leg of the standalone scaling pair runs ~2.3x
faster than every round-5 N leg, while the 4-executor x 32-core leg
stays in its round-5 range — so the pairwise N->4N efficiency collapses
to ~0.25-0.30 not because the engine stopped scaling but because BOTH
levels sit on the same saturated memory bus: this box's aggregate
bandwidth stops growing well before 32 threads, and the triple pipeline
(parquet scan + 3 SMJ shuffles + spill) is bandwidth-bound, not
ALU-bound. This script measures that directly: each thread sums a
private 256 MiB float64 buffer (the exact probe bench.py and the
scaling harness record per leg), in parallel, for T in the sweep;
aggregate GB/s vs T is the machine's core-scaling envelope. Any
N->4N core-count efficiency target must be read against this envelope:
levels where BW(4N)/BW(N) ~= 1 cannot show compute scaling on one box,
which is exactly why a real 4-node cluster (4 private buses) is the
shape the 8->32 configuration models, and why the in-sandbox headline
pair is measured in the unsaturated regime instead.

Writes BENCH/MEMBW_SWEEP.json. Usage: python scripts/membw_sweep.py
"""

import json
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
N_MB = 256
THREADS = [1, 2, 4, 8, 16, 32]
REPS = 3  # best-of: ambient dips can only lower a sample, never raise


def one_thread(buf, out, idx, start_evt):
    start_evt.wait()
    t0 = time.perf_counter()
    s = buf.sum()  # numpy releases the GIL; pure streaming read
    out[idx] = (time.perf_counter() - t0, float(s))


def aggregate_gbps(n_threads: int) -> float:
    bufs = [np.ones(N_MB * 131072, dtype=np.float64)
            for _ in range(n_threads)]
    out = [None] * n_threads
    start = threading.Event()
    ts = [threading.Thread(target=one_thread, args=(b, out, i, start))
          for i, b in enumerate(bufs)]
    for t in ts:
        t.start()
    time.sleep(0.05)
    wall0 = time.perf_counter()
    start.set()
    for t in ts:
        t.join()
    wall = time.perf_counter() - wall0
    assert all(o[1] > 0 for o in out)
    return round(n_threads * N_MB / 1024.0 / wall, 2)


def mem_available_mb() -> int:
    for line in open("/proc/meminfo"):
        if line.startswith("MemAvailable:"):
            return int(line.split()[1]) // 1024
    return 0


def main():
    result = {"n_mb_per_thread": N_MB, "reps": REPS, "sweep": {},
              "mem_available_mb": mem_available_mb()}
    for t in THREADS:
        # the T-thread point holds T private buffers resident; if that
        # exceeds available RAM the "bandwidth" sample would measure
        # swap, not the bus — skip the point and flag it in the JSON
        # instead of committing a silently wrong envelope number
        need = t * N_MB * 2  # x2 headroom over the buffers themselves
        if need > mem_available_mb():
            result.setdefault("skipped_insufficient_mem", []).append(t)
            print(f"threads={t:3d}  SKIPPED (needs ~{need} MiB, "
                  f"available {mem_available_mb()} MiB)", flush=True)
            continue
        best = max(aggregate_gbps(t) for _ in range(REPS))
        result["sweep"][str(t)] = best
        print(f"threads={t:3d}  aggregate={best} GB/s", flush=True)
    sw = result["sweep"]
    if "1" in sw:
        result["scaling_vs_1thread"] = {
            k: round(v / (sw["1"] * int(k)), 3) for k, v in sw.items()}
    if "8" in sw and "32" in sw:
        result["bw_ratio_8_to_32"] = round(sw["32"] / sw["8"], 3)  # ideal 4.0
    if "2" in sw and "8" in sw:
        result["bw_ratio_2_to_8"] = round(sw["8"] / sw["2"], 3)    # ideal 4.0
    out = REPO / "BENCH" / "MEMBW_SWEEP.json"
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
