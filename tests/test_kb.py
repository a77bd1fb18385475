"""KB dim builders + lookup joins (J1-J4, A3-A5)."""

from pyspark.sql import functions as F

from kgpipe import schemas
from kgpipe.kb import (
    build_alias_map,
    build_kb_context,
    build_lang_priority,
    build_mention_counts,
    build_canonical_titles,
    build_title_map,
    resolution_cascade,
    resolve_redirect_closure,
    resolve_titles,
)


def _mini_kb(spark):
    rows = [
        ("Q5", {"en": "Alpha", "de": "Alpha De"}, {"en": "a thing"},
         {"en": "Alpha", "de": "Alpha (de)"}, {"en": ["alf", "Alpha"]}),
        ("Q50", {"en": "Alpha"}, {"en": "another alpha"},
         {"en": "Alpha"}, {}),
        ("Q7", {"en": "Dis"}, {"en": "Wikimedia disambiguation page"},
         {"en": "Dis"}, {}),
    ]
    return spark.createDataFrame(rows, schema=schemas.ENTITY_KB)


def test_title_map_and_max_qid_tiebreak(spark):
    kb = _mini_kb(spark)
    tm = build_title_map(kb)
    # both Q5 and Q50 claim (en, Alpha) → J1 resolves to max numeric QID
    probe = spark.createDataFrame([("en", "Alpha")], "lang string, title string")
    out = resolve_titles(probe, tm).collect()
    assert out[0]["resolved_qid"] == "Q50"


def test_alias_map_lowercased(spark):
    am = build_alias_map(_mini_kb(spark))
    rows = {(r["alias_lc"], r["qid"]) for r in am.collect()}
    assert ("alpha", "Q5") in rows and ("alf", "Q5") in rows
    assert ("alpha de", "Q5") in rows
    assert all(a == a.lower() for a, _ in rows)


def test_redirect_closure_chain_and_cycle(spark):
    rows = [
        ("en", "D", "C"), ("en", "C", "B"), ("en", "B", "A"),
        ("en", "Loop A", "Loop B"), ("en", "Loop B", "Loop A"),
    ]
    rd = spark.createDataFrame(rows, schema=schemas.REDIRECTS)
    closure = {r["src_title"]: r["final_title"]
               for r in resolve_redirect_closure(rd, max_hops=10).collect()}
    assert closure["D"] == "A"
    assert closure["C"] == "A"
    # 2-cycle terminates at the 10-hop parity (bounded chase,
    # GENRE/genre/utils.py:454-459): A→B then 9 more hops → B
    assert closure["Loop A"] in ("Loop A", "Loop B")
    # exact parity with the reference loop: 10 rewrites from "Loop A"
    title = "Loop A"
    red = {("en", "Loop A"): "Loop B", ("en", "Loop B"): "Loop A"}
    hops = 10
    while ("en", title) in red and hops > 0:
        title = red[("en", title)]
        hops -= 1
    assert closure["Loop A"] == title


def _reference_get_wikidata_ids(anchor, lang, title2qids, redirect2title,
                                alias2qids):
    """Python twin of get_wikidata_ids (GENRE/genre/utils.py:439-488)
    semantics, for parity assertion."""
    from urllib.parse import unquote

    # search_simple: its title probe hits the alias dict with a tuple
    # key — dead; only http/empty short-circuit, normalization persists
    if "http" in anchor:
        return set(), "simple"
    t = unquote(anchor).split("#")[0].replace("_", " ")
    if t == "":
        return set(), "simple"
    t = t[0].upper() + t[1:]
    # search_wikipedia: chase then probe
    hops = 10
    while (lang, t) in redirect2title and hops > 0:
        t = redirect2title[(lang, t)]
        hops -= 1
    if (lang, t) in title2qids:
        return set(title2qids[(lang, t)]), "wikipedia"
    # search_wikidata: alias probe with lower(chased title)
    return set(alias2qids.get(t.lower(), [])), "wikidata"


def test_resolution_cascade_provenance(spark):
    kb = _mini_kb(spark)
    tm, am = build_title_map(kb), build_alias_map(kb)
    rd = spark.createDataFrame([("en", "Old Alpha", "Alpha")],
                               schema=schemas.REDIRECTS)
    closure = resolve_redirect_closure(rd)
    anchors = ["Alpha", "Old Alpha", "Old_Alpha#History", "%41lpha",
               "ALF", "nope", "http://x/Alpha", "", "Old alpha"]
    probes = spark.createDataFrame([("en", a) for a in anchors],
                                   "lang string, anchor string")
    out = {r["anchor"]: (set(r["resolved_qids"]), r["resolved_qid"],
                         r["provenance"])
           for r in resolution_cascade(probes, tm, closure, am).collect()}

    # every anchor is redirect-chased + title-probed (search_simple's
    # direct hit is a dead branch in the reference)
    assert out["Alpha"] == ({"Q5", "Q50"}, "Q50", "wikipedia")
    assert out["Old Alpha"] == ({"Q5", "Q50"}, "Q50", "wikipedia")
    # normalization: '#'-fragment strip + '_'→' ' + percent-decode
    assert out["Old_Alpha#History"] == ({"Q5", "Q50"}, "Q50", "wikipedia")
    assert out["%41lpha"] == ({"Q5", "Q50"}, "Q50", "wikipedia")
    # alias fallback probes lower(chased title)
    assert out["ALF"] == ({"Q5"}, "Q5", "wikidata")
    # empty alias probe still reports 'wikidata' (reference's last return)
    assert out["nope"] == (set(), None, "wikidata")
    # only first char is uppercased: 'Old alpha' misses the redirect
    assert out["Old alpha"] == (set(), None, "wikidata")
    # http / empty short-circuit with provenance 'simple'
    assert out["http://x/Alpha"] == (set(), None, "simple")
    assert out[""] == (set(), None, "simple")

    # parity with the Python twin of the reference functions
    title2qids, redirect2title, alias2qids = {}, {("en", "Old Alpha"): "Alpha"}, {}
    for r in tm.collect():
        title2qids.setdefault((r["lang"], r["title"]), set()).add(r["qid"])
    for r in am.collect():
        alias2qids.setdefault(r["alias_lc"], set()).add(r["qid"])
    for a in anchors:
        qids, prov = _reference_get_wikidata_ids(
            a, "en", title2qids, redirect2title, alias2qids)
        assert out[a][0] == qids, a
        assert out[a][2] == prov, a


def test_kb_context_disambig_blanked_and_arg_order(spark):
    kb = _mini_kb(spark)
    args = spark.createDataFrame(
        [("Q5", "P279", "Q50", 0), ("Q5", "P31", "Q50", 1), ("Q5", "P31", "Q7", 0)],
        schema=schemas.KB_ARGS,
    )
    ctx = {r["qid"]: r for r in build_kb_context(kb, args).collect()}
    assert ctx["Q7"]["descriptions"] == {} and ctx["Q7"]["titles"] == {}
    assert ctx["Q7"]["is_disambig"]
    # P31 edges first (in ord order), then P279 (get_wikidata.py:143-150)
    assert [(a["prop"], a["arg_qid"]) for a in ctx["Q5"]["arguments"]] == \
        [("P31", "Q7"), ("P31", "Q50"), ("P279", "Q50")]


def test_mention_counts_and_lang_priority(spark):
    anchors = spark.createDataFrame(
        [("foo", "Q1"), ("foo", "Q1"), ("foo", "Q2")], "mention string, qid string"
    )
    mc = {(r["mention"], r["qid"]): r["cnt"]
          for r in build_mention_counts(anchors).collect()}
    assert mc[("foo", "Q1")] == 2 and mc[("foo", "Q2")] == 1

    al = spark.createDataFrame(
        [("Q1", "de"), ("Q1", "de"), ("Q1", "en"), ("Q2", "en")],
        "qid string, lang string",
    )
    pr = {r["qid"]: r["langs"] for r in build_lang_priority(al).collect()}
    assert pr["Q1"] == ["de", "en"]  # per-qid count wins
    assert pr["Q2"] == ["en"]


def test_canonical_titles(spark):
    kb = _mini_kb(spark)
    pr = spark.createDataFrame([("Q5", ["fr", "de", "en"])],
                               "qid string, langs array<string>")
    out = build_canonical_titles(kb, pr).collect()
    assert (out[0]["lang"], out[0]["title"]) == ("de", "Alpha (de)")


def test_compress_wikidata_dump(spark):
    from kgpipe.kb import compress_wikidata_dump

    rows = [
        ("Q1", {"en": "A"}, {"en": "d"}, {"en": "A"}, {},
         ["Q5"], []),                       # kept
        ("Q2", {"en": "B"}, {"en": "d"}, {"en": "B"}, {},
         ["Q4167836"], []),                 # NOPAGE P31 → dropped (P7)
        ("Q3", {"en": "C"}, {"en": "d"}, {}, {},
         ["Q5"], []),                       # no sitelinks → dropped (P8)
        ("Q4", {"en": "D"}, {"en": "d"}, {"en": "D"}, {},
         [], ["Q24046192"]),                # NOPAGE P279 → dropped (P7)
    ]
    schema = ("qid string, labels map<string,string>,"
              " descriptions map<string,string>, sitelinks map<string,string>,"
              " aliases map<string,array<string>>,"
              " instance_of array<string>, subclass_of array<string>")
    raw = spark.createDataFrame(rows, schema)
    kept = {r["qid"] for r in compress_wikidata_dump(raw).collect()}
    assert kept == {"Q1"}


def test_exclude_pairs(spark):
    from kgpipe.kb import exclude_pairs

    train = spark.createDataFrame(
        [("m1", "Q1", 1), ("m2", "Q2", 2)], "mention string, qid string, x int"
    )
    test = spark.createDataFrame([("m1", "Q1")], "mention string, qid string")
    out = {r["mention"] for r in exclude_pairs(train, test).collect()}
    assert out == {"m2"}
