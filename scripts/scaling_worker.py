"""One scaling measurement: run the full KG pipeline on synthetic
transcripts at a given parallelism; print JSON {turns, seconds,
turns_per_sec}. Invoked by scripts/run_scaling.py in a fresh process
per parallelism level (a JVM binds its master once)."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kgpipe.session import get_spark  # noqa: E402
from kgpipe import fixtures  # noqa: E402
from kgpipe.pipeline import run_pipeline  # noqa: E402


def main(cores: int, n_convs: int):
    # Heap is held CONSTANT across parallelism levels: A/B showed a
    # 64g heap makes local[32] 1.7× slower than the same leg at 8g
    # (GC ergonomics), so scaling heap with cores would measure the
    # JVM, not the engine. 12g fits 32 concurrent tasks comfortably
    # for these row sizes.
    import os

    os.environ.setdefault("KGPIPE_DRIVER_MEM", "12g")
    spark = get_spark(f"scaling-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=max(8, 2 * cores))
    spark.sparkContext.setLogLevel("ERROR")

    fx = fixtures.full_fixture_set(spark, n_convs=n_convs, n_entities=500)
    transcripts = fx["transcripts"].persist()
    n_turns = transcripts.count()  # materialize input outside the timer

    # KB dims are corpus-constant (the reference's preprocess_* stage);
    # built outside the per-turn throughput timer
    from kgpipe.pipeline import build_dims

    dims = build_dims(spark, fx["entity_kb"], fx["kb_args"],
                      fx["mention_counts"])

    t0 = time.time()
    res = run_pipeline(
        spark, transcripts, fx["entity_kb"], fx["kb_args"],
        fx["mention_counts"], fx["wiki_summaries"],
        language="en", check_invariants=False, dims=dims,
    )
    n_triples = res["triples"].count()
    dt = time.time() - t0

    print(json.dumps({
        "cores": cores,
        "turns": n_turns,
        "triples": n_triples,
        "seconds": round(dt, 2),
        "turns_per_sec": round(n_turns / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]))
