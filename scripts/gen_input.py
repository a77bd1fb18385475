"""Generate the scaling-experiment input once to /tmp/kgs so every
(cores, mode) leg reads identical bytes."""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kgpipe.session import get_spark  # noqa: E402
from kgpipe import fixtures  # noqa: E402

n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 25000
INPUT_DIR = os.environ.get("KGPIPE_INPUT_DIR", "/tmp/kgs")

spark = get_spark("gen-input", master="local[16]")
spark.sparkContext.setLogLevel("ERROR")
fx = fixtures.full_fixture_set(spark, n_convs=n_convs, n_entities=500)
for name in ("transcripts", "entity_kb", "kb_args", "mention_counts",
             "wiki_summaries"):
    fx[name].write.mode("overwrite").parquet(f"{INPUT_DIR}/{name}")
print("turns:", spark.read.parquet(INPUT_DIR + "/transcripts").count())
spark.stop()
