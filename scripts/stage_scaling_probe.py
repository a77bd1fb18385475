"""Diagnostic: per-stage wall time at a given core count, reading
pre-generated input from /tmp/kgs (so fixture generation is excluded
and both legs see identical bytes)."""

import sys
import time
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

cores = int(sys.argv[1])
os.environ["KGPIPE_DRIVER_MEM"] = f"{2 * cores}g"

from kgpipe.session import get_spark  # noqa: E402
from kgpipe.pipeline import surfaces_from_dims  # noqa: E402
from kgpipe.kb import build_alias_map, build_kb_context, build_title_map  # noqa: E402
from kgpipe.mentions import detect_mentions, tokenize, with_turn_order  # noqa: E402
from kgpipe.candidates import generate_candidates  # noqa: E402
from kgpipe.linking import link_mentions  # noqa: E402
from kgpipe.enrich import accept_and_enrich  # noqa: E402
from kgpipe.classify import classify  # noqa: E402
from kgpipe.triples import emit_triples  # noqa: E402

spark = get_spark(f"probe-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=max(8, 2 * cores))
spark.sparkContext.setLogLevel("ERROR")

tr = spark.read.parquet("/tmp/kgs/transcripts")
kb = spark.read.parquet("/tmp/kgs/entity_kb")
args = spark.read.parquet("/tmp/kgs/kb_args")
mc = spark.read.parquet("/tmp/kgs/mention_counts")
ws = spark.read.parquet("/tmp/kgs/wiki_summaries")

t0 = time.time()
tm, am, kc = build_title_map(kb), build_alias_map(kb), build_kb_context(kb, args)
surf = surfaces_from_dims(am, mc)
print(f"[{cores}] dims+surfaces: {time.time()-t0:.1f}s", flush=True)

base = tempfile.mkdtemp()
total0 = time.time()


def cut(df, name):
    t = time.time()
    df.write.mode("overwrite").parquet(f"{base}/{name}")
    print(f"[{cores}] {name}: {time.time()-t:.1f}s", flush=True)
    return spark.read.parquet(f"{base}/{name}")


m = cut(detect_mentions(tokenize(with_turn_order(tr)), surfaces=surf), "mentions")
l = cut(link_mentions(m, generate_candidates(m, mc), tm), "linked")
e = cut(accept_and_enrich(l, kc, ws, "en"), "enriched")
c = classify(e)
t = time.time()
n = emit_triples(c).count()
print(f"[{cores}] classify+emit: {time.time()-t:.1f}s ({n} triples)", flush=True)
total = time.time() - total0
nturns = tr.count()
print(f"[{cores}] TOTAL pipeline: {total:.1f}s ({nturns/total:.0f} turns/s)",
      flush=True)
