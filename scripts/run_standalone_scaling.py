"""N → 4N EXECUTOR scaling measurement on a real multi-JVM Spark
standalone cluster (the round-2 verdict's top ask: test the
multi-executor claim instead of re-measuring the single-JVM proxy).

Topology: 1 master + 4 worker JVMs on this box, each worker offering
8 cores / 4g. Legs differ ONLY in spark.cores.max:
  N leg  — cores.max=2 → 1 executor  × 2 cores × 2g
  4N leg — cores.max=8 → 4 executors × 2 cores × 2g
Per-executor resources constant; the 4N leg has 4× aggregate heap and
4 independent GC domains — exactly what a real 4N cluster has and the
single-JVM local[8/32] proxy structurally cannot have. 2-core executors
are the honest shape on THIS host: its memory bandwidth saturates at
~2-3 streaming cores (see BENCH/BASELINE.md microbenchmark), so an
8-core-executor pair (cores.max 8 vs 32) measures the memory wall, not
the engine — run it via KGPIPE_EXEC_CORES=8 KGPIPE_EXEC_MEM=3g for the
disclosure row.

Legs are INTERLEAVED (N, 4N, N, 4N, …) and each level reports its best
trial (sandbox host shows multi-x background-load variance). Event logs
per leg give job counts + GC time for the BENCH/BASELINE.md table.

Load-aware admission protocol (r6, closing the pairwise-median target):
the r5 record proved identical code+input swings pair efficiency
0.52→0.89 with ambient neighbor load on this shared memory bus (probe
trace committed in STANDALONE_RUN_r5a/b.json). So each PAIR is now
admitted only when the streaming-bandwidth probe clears
KGPIPE_ADMIT_GBPS (default 2.0 GB/s — the threshold the r5 verdict
named): before a pair starts, the harness samples the probe every 15 s
up to KGPIPE_ADMIT_WAIT_S (default 300 s), recording every sample; if
the window never opens the pair runs anyway, flagged admitted=false.
The probe alone proved blind to CPU-bound neighbor load (2026-08-17:
probe 8-10 GB/s while loadavg_1m sat at 28-32), so admission ALSO
requires loadavg_1m <= KGPIPE_ADMIT_LOAD (default 6.0) — which doubles
as a cool-down for the previous pair's own decaying run-queue load.
A pair whose legs then STILL ran dirty (either leg's pre-leg probe
below threshold — recorded before the leg's result exists, so the
rule can't cherry-pick outcomes) is re-run once, budget
KGPIPE_MAX_RERUNS (default 2) per invocation; every attempt is
committed to the JSON, none dropped. The headline median is over the
final attempt of every pair (nothing excluded); the admitted-only
median and the probe-vs-efficiency correlation over ALL attempts are
reported alongside as the quantitative load attribution.

Usage: python scripts/run_standalone_scaling.py [n_convs] [n_trials] [out_name]
"""

import json
import os
import shutil
import signal
import subprocess
import sys
import time
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
N_CONVS = int(sys.argv[1]) if len(sys.argv) > 1 else 80000
N_TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
EV_ROOT = "/tmp/kgs/eventlogs"

import pyspark  # noqa: E402

SPARK_HOME = os.path.dirname(pyspark.__file__)
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")

_procs: list = []


def _spawn(args, log):
    f = open(log, "w")
    p = subprocess.Popen(args, stdout=f, stderr=subprocess.STDOUT,
                         env={**os.environ, "SPARK_HOME": SPARK_HOME,
                              "PYSPARK_PYTHON": sys.executable})
    _procs.append(p)
    return p


def start_cluster(n_workers=4, worker_cores=8, worker_mem="4g"):
    os.makedirs("/tmp/kgs/logs", exist_ok=True)
    _spawn([SPARK_CLASS, "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8080"],
           "/tmp/kgs/logs/master.log")
    time.sleep(6)
    for i in range(n_workers):
        _spawn([SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                "spark://127.0.0.1:7077", "--host", "127.0.0.1",
                "--cores", str(worker_cores), "--memory", worker_mem,
                "--webui-port", str(8081 + i)],
               f"/tmp/kgs/logs/worker{i}.log")
    time.sleep(10)


def stop_cluster():
    for p in _procs:
        try:
            p.send_signal(signal.SIGTERM)
        except OSError:
            pass
    for p in _procs:
        try:
            p.wait(timeout=15)
        except subprocess.TimeoutExpired:
            p.kill()


def build_pyzip():
    zpath = "/tmp/kgs/kgpipe.zip"
    os.makedirs("/tmp/kgs", exist_ok=True)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for py in sorted((REPO / "kgpipe").rglob("*.py")):
            z.write(py, py.relative_to(REPO))
    return zpath


EXEC_CORES = int(os.environ.get("KGPIPE_EXEC_CORES", "2"))
EXEC_MEM = os.environ.get("KGPIPE_EXEC_MEM", "2g")


# shared with bench.py so the two harnesses' load/steal fields stay
# numerically comparable (kgpipe/hostload.py has the full rationale)
from kgpipe.hostload import cpu_jiffies, load_probe_gbps  # noqa: E402


def run_leg(cores_max: int, trial) -> dict:
    ev_dir = f"{EV_ROOT}/c{cores_max}_t{trial}"
    last_err = None
    for attempt in range(2):  # one retry: a leg can die to transient
        # sample the load disclosure INSIDE the attempt loop so a
        # retried leg's recorded probe/loadavg reflect the attempt that
        # actually produced the result, not a stale pre-failure window
        probe = load_probe_gbps()
        loadavg = round(os.getloadavg()[0], 2)
        steal0, total0 = cpu_jiffies()
        # fresh eventlog dir per attempt: a failed first attempt would
        # otherwise leave a truncated app-* log that eventlog_stats
        # could pick over the good retry's log
        shutil.rmtree(ev_dir, ignore_errors=True)
        out = subprocess.run(  # executor/port hiccups on this host
            [sys.executable, str(REPO / "scripts/standalone_worker.py"),
             str(cores_max), str(EXEC_CORES), EXEC_MEM],
            capture_output=True, text=True,
            env={**os.environ, "KGPIPE_EVENTLOG_DIR": ev_dir},
        )
        if out.returncode == 0:
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            r = json.loads(line)
            r["ev_dir"] = ev_dir
            r["probe_gbps_before"] = probe
            r["loadavg_1m_before"] = loadavg
            # in-leg interference disclosure: hypervisor steal share
            # over the leg's own wall window + a post-leg probe. A leg
            # admitted into a clean window can still be degraded by a
            # neighbor spinning up mid-leg; these two fields make that
            # visible in the committed record instead of arguable.
            steal1, total1 = cpu_jiffies()
            r["steal_pct_during"] = round(
                100.0 * (steal1 - steal0) / max(1, total1 - total0), 2)
            r["probe_gbps_after"] = load_probe_gbps()
            if attempt:
                r["retried"] = True
            return r
        last_err = out
        print(f"leg cores={cores_max} trial={trial} attempt {attempt} "
              f"FAILED rc={out.returncode}; stderr tail:\n"
              + "\n".join(out.stderr.splitlines()[-15:]), flush=True)
    raise RuntimeError(
        f"leg cores={cores_max} trial={trial} failed twice; last stderr:\n"
        + "\n".join((last_err.stderr or "").splitlines()[-30:]))


def eventlog_stats(ev_dir: str) -> dict:
    """Summary of the leg's (plain-JSON) event log via
    scripts/eventlog_summary.py."""
    from eventlog_summary import summarize

    try:
        files = [p for p in Path(ev_dir).iterdir()
                 if p.is_file() and p.name.startswith("app-")]
    except OSError:
        return {}
    if not files:
        return {}
    # newest app-* log: belt-and-braces with the per-attempt dir wipe
    # (a retried leg must never be summarized from a stale log)
    return summarize(str(max(files, key=lambda p: p.stat().st_mtime)))


ADMIT_GBPS = float(os.environ.get("KGPIPE_ADMIT_GBPS", "2.0"))
# r6 addition: the bandwidth probe alone misses CPU-bound neighbor load
# (measured 2026-08-17: probe held 8-10 GB/s while loadavg_1m sat at
# 28-32 — see BENCH/STANDALONE_RUN_r6_8to32.json pair_loadavg_1m), so
# admission also requires a quiet run queue. The loadavg gate doubles
# as a cool-down: the previous pair's own decaying load must drain
# before the next pair is admitted.
ADMIT_LOAD = float(os.environ.get("KGPIPE_ADMIT_LOAD", "6.0"))
ADMIT_WAIT_S = int(os.environ.get("KGPIPE_ADMIT_WAIT_S", "300"))
MAX_RERUNS = int(os.environ.get("KGPIPE_MAX_RERUNS", "2"))


def _leg_clean(leg: dict) -> bool:
    """A leg ran clean when its pre-leg window met BOTH admission
    criteria — recorded before the leg's result existed, so the rule
    cannot cherry-pick outcomes."""
    return (leg["probe_gbps_before"] >= ADMIT_GBPS
            and leg["loadavg_1m_before"] <= ADMIT_LOAD)


def wait_for_window(pair_idx: int) -> dict:
    """Block until the bandwidth probe clears ADMIT_GBPS AND loadavg_1m
    is at most ADMIT_LOAD (sampling every 15 s, up to ADMIT_WAIT_S),
    recording every sample. Returns the admission record; `admitted` is
    False when the window never opened (the pair still runs — flagged,
    never dropped)."""
    samples = []
    t0 = time.time()
    while True:
        p = load_probe_gbps()
        la = round(os.getloadavg()[0], 2)
        samples.append({"gbps": p, "load_1m": la})
        if p >= ADMIT_GBPS and la <= ADMIT_LOAD:
            return {"pair": pair_idx, "admitted": True, "samples": samples,
                    "waited_s": round(time.time() - t0, 1)}
        if time.time() - t0 >= ADMIT_WAIT_S:
            print(f"pair {pair_idx}: admission window never opened "
                  f"(probe {p} GB/s vs >= {ADMIT_GBPS}, load {la} vs "
                  f"<= {ADMIT_LOAD} after {ADMIT_WAIT_S}s) — running "
                  f"flagged", flush=True)
            return {"pair": pair_idx, "admitted": False, "samples": samples,
                    "waited_s": round(time.time() - t0, 1)}
        time.sleep(15)


def run_pair(pair_idx: int, legs, attempt: int) -> dict:
    """One (N leg, 4N leg) pair, with the admission gate in front."""
    adm = wait_for_window(pair_idx)
    a = run_leg(legs[0], f"{pair_idx}a{attempt}")
    b = run_leg(legs[1], f"{pair_idx}a{attempt}")
    # clean = BOTH legs' pre-leg windows met the admission criteria
    # (probe AND loadavg); recorded before each leg's result existed,
    # so this can't cherry-pick
    clean = _leg_clean(a) and _leg_clean(b)
    return {
        "pair": pair_idx, "attempt": attempt, "admission": adm,
        "clean": clean, "N": a, "4N": b,
        "efficiency": round(
            (b["turns_per_sec"] / a["turns_per_sec"]) / 4.0, 3),
    }


def _pearson(xs, ys):
    n = len(xs)
    if n < 3:
        return None
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    if sxx == 0 or syy == 0:
        return None
    return round(sxy / (sxx * syy) ** 0.5, 3)


def main():
    out_name = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "KGPIPE_SCALING_OUT", "STANDALONE_RUN.json")
    if not os.path.exists("/tmp/kgs/transcripts"):
        subprocess.run([sys.executable, str(REPO / "scripts/gen_input.py"),
                        str(N_CONVS)], check=True)
    build_pyzip()
    shutil.rmtree(EV_ROOT, ignore_errors=True)
    start_cluster()
    load_probe_gbps()  # discard: first call pays numpy/page-in warmup
    legs = (EXEC_CORES, 4 * EXEC_CORES)
    attempts = []   # EVERY pair run, including re-runs — none dropped
    final = []      # the attempt that counts for each pair (last run)
    reruns_left = MAX_RERUNS
    try:
        for i in range(N_TRIALS):
            p = run_pair(i, legs, attempt=0)
            attempts.append(p)
            print(f"pair {i} attempt 0: eff={p['efficiency']} "
                  f"clean={p['clean']} probes="
                  f"[{p['N']['probe_gbps_before']}, "
                  f"{p['4N']['probe_gbps_before']}]", flush=True)
            if not p["clean"] and reruns_left > 0:
                reruns_left -= 1
                p = run_pair(i, legs, attempt=1)
                attempts.append(p)
                print(f"pair {i} attempt 1 (re-run): eff={p['efficiency']} "
                      f"clean={p['clean']}", flush=True)
            final.append(p)
    finally:
        stop_cluster()

    import statistics

    n_best = max((p["N"] for p in final), key=lambda r: r["turns_per_sec"])
    f_best = max((p["4N"] for p in final), key=lambda r: r["turns_per_sec"])
    eff_best = (f_best["turns_per_sec"] / n_best["turns_per_sec"]) / 4.0
    pair_effs = [p["efficiency"] for p in final]
    clean_effs = [p["efficiency"] for p in final if p["clean"]]
    # quantitative load attribution: over ALL attempts (re-runs
    # included), does the dirtier leg window predict lower efficiency?
    corr = _pearson(
        [min(p["N"]["probe_gbps_before"], p["4N"]["probe_gbps_before"])
         for p in attempts],
        [p["efficiency"] for p in attempts])

    s1, s4 = eventlog_stats(n_best["ev_dir"]), eventlog_stats(f_best["ev_dir"])
    result = {
        "n_executors": {"N": n_best["executors"], "4N": f_best["executors"]},
        "turns": n_best["turns"],
        "best": {"N": n_best, "4N": f_best},
        "all_seconds": {"N": [p["N"]["seconds"] for p in final],
                        "4N": [p["4N"]["seconds"] for p in final]},
        "eventlog": {"N": s1, "4N": s4},
        "efficiency_N_to_4N": round(eff_best, 3),
        "efficiency_per_pair": pair_effs,
        "efficiency_median_pair": round(statistics.median(pair_effs), 3)
        if pair_effs else None,
        # admission protocol (documented in the module docstring): the
        # pairs whose BOTH legs started in a >= threshold window
        "admission_rule_gbps": ADMIT_GBPS,
        "admission_rule_load_1m": ADMIT_LOAD,
        # resolved per-leg shuffle width, mirroring the expression in
        # standalone_worker.py — recording the raw env var said "null"
        # when unset, hiding that the two legs then ran DIFFERENT
        # physical plans (8 vs 16 partitions at 2->8 cores), the very
        # asymmetry this field exists to disclose
        "shuffle_partitions": {
            "N": int(os.environ.get("KGPIPE_SHUFFLE_PARTS",
                                    max(8, 2 * legs[0]))),
            "4N": int(os.environ.get("KGPIPE_SHUFFLE_PARTS",
                                     max(8, 2 * legs[1]))),
            "pinned": "KGPIPE_SHUFFLE_PARTS" in os.environ,
        },
        "efficiency_per_clean_pair": clean_effs,
        "efficiency_median_clean": round(statistics.median(clean_effs), 3)
        if clean_effs else None,
        "probe_vs_efficiency_pearson": corr,
        "reruns_used": MAX_RERUNS - reruns_left,
        # full trace: every attempt incl. re-runs and admission waits
        "attempts": attempts,
        # in-band host-load disclosure: bandwidth probe + 1-min loadavg
        # taken immediately before each leg (pairs under a probe dip /
        # loadavg spike ran against neighbor load; see bench.py)
        "pair_probes_gbps": [
            [p["N"]["probe_gbps_before"], p["4N"]["probe_gbps_before"]]
            for p in final
        ],
        "pair_loadavg_1m": [
            [p["N"]["loadavg_1m_before"], p["4N"]["loadavg_1m_before"]]
            for p in final
        ],
        # in-LEG interference (r6b): hypervisor steal share measured
        # across each leg's own wall window — the signal the pre-leg
        # admission gates cannot see (.get: absent in pre-r6b records)
        "pair_steal_pct": [
            [p["N"].get("steal_pct_during"), p["4N"].get("steal_pct_during")]
            for p in final
        ],
        "steal_vs_efficiency_pearson": _pearson(
            [max(p["N"].get("steal_pct_during") or 0,
                 p["4N"].get("steal_pct_during") or 0) for p in attempts],
            [p["efficiency"] for p in attempts]),
    }
    print(json.dumps(result, indent=2))
    # BENCH/STANDALONE.json holds the curated multi-trial record;
    # each automated run writes its own file
    with open(REPO / "BENCH" / out_name, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
