"""Large-corpus oracle parity (VERDICT r1 item 9): run the full Spark
pipeline AND the pure-Python reference-semantics twin on the same
~60k-turn synthetic corpus; report strong-tuple triple P/R (target
≥0.95 per BASELINE.json; we assert exact parity). Writes
BENCH/PARITY.md. Usage: python scripts/parity_large.py [n_convs]."""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kgpipe.session import get_spark  # noqa: E402
from kgpipe import fixtures  # noqa: E402
from kgpipe.oracle import oracle_triples  # noqa: E402
from kgpipe.oracle.reference_semantics import triple_prf  # noqa: E402
from kgpipe.pipeline import run_pipeline  # noqa: E402

REPO = Path(__file__).resolve().parents[1]
n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000


def main():
    spark = get_spark("parity-large", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    fx = fixtures.full_fixture_set(spark, n_convs=n_convs, n_entities=500)
    tr = fx["transcripts"].persist()
    n_turns = tr.count()

    langs = {}
    for language in ("en", "de"):
        t0 = time.time()
        res = run_pipeline(
            spark, tr, fx["entity_kb"], fx["kb_args"], fx["mention_counts"],
            fx["wiki_summaries"], language=language, check_invariants=False,
        )
        spark_triples = {(r["subj"], r["pred"], r["obj"])
                         for r in res["triples"].collect()}
        t_spark = time.time() - t0

        t0 = time.time()
        rows = [(r["conv_id"], r["turn_idx"], r["text"]) for r in tr.collect()]
        gold = oracle_triples(rows, fx["catalog"], language=language)
        t_oracle = time.time() - t0

        prf = triple_prf(spark_triples, gold)
        langs[language] = {**{k: round(v, 6) if isinstance(v, float) else v
                              for k, v in prf.items()},
                           "spark_sec": round(t_spark, 1),
                           "oracle_sec": round(t_oracle, 1)}
        print(language, langs[language], flush=True)

    md = f"""# BENCH/PARITY — large-corpus oracle parity

Full Spark pipeline vs the pure-Python reference-semantics twin
(`kgpipe/oracle/`) on the same synthetic corpus: **{n_turns} turns**
({n_convs} conversations, 500 entities, Zipfian mention skew), strong
exact-tuple P/R over the emitted (subj, pred, obj) sets
(GENRE/genre/utils.py:284-285 semantics). Target ≥ 0.95
(BASELINE.json); measured:

| language | precision | recall | f1 | n_spark | n_oracle |
|---|---|---|---|---|---|
| en | {langs['en']['precision']} | {langs['en']['recall']} | {langs['en']['f1']} | {langs['en']['n_pred']} | {langs['en']['n_gold']} |
| de (EN-fallback paths) | {langs['de']['precision']} | {langs['de']['recall']} | {langs['de']['f1']} | {langs['de']['n_pred']} | {langs['de']['n_gold']} |

(Single-node Python twin: {langs['en']['oracle_sec']}s vs Spark
pipeline {langs['en']['spark_sec']}s at local[32] — the twin IS the
reference's row-loop architecture, included for semantics, not speed.)
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "PARITY.md").write_text(md)
    print(md)
    print(json.dumps({"en_f1": langs["en"]["f1"], "de_f1": langs["de"]["f1"],
                      "turns": n_turns}))
    spark.stop()


if __name__ == "__main__":
    main()
