"""S4 wiki-extractor scan + anchor-dict build (wiki_extract.py)."""

import os

from pyspark.sql import functions as F

from kgpipe import schemas
from kgpipe.kb import build_alias_map, build_title_map, resolve_redirect_closure
from kgpipe.wiki_extract import (
    anchor_rows,
    anchors_solved_metrics,
    check_anchor_offsets,
    extract_wiki_pages,
    fill_page_anchors,
    mention_counts_from_anchors,
    parse_extractor_text,
    resolve_anchor_hrefs,
)

SHARD_1 = """<doc id="1" url="https://x/A" title="Page A">
Page A

Intro with <a href="B_page">B link</a> and <a href="C">C &amp; co</a> tail.
</doc>
<doc id="2" url="https://x/D" title="Page D">
Plain line, no anchors.
</doc>
"""

SHARD_2 = """<doc id="3" url="https://x/E" title="Page E">
<b>Bold</b> then <a href="http://ext">ext</a> and <a href="Old%20Alpha">alpha</a>.
</doc>
"""


def test_parse_extractor_text_offsets_and_entities():
    pages = parse_extractor_text(SHARD_1)
    assert [p["id"] for p in pages] == ["1", "2"]
    a = pages[0]
    assert a["title"] == "Page A"
    assert a["paragraphs"] == ["Page A", "",
                               "Intro with B link and C & co tail."]
    # reference self-check semantics: paragraph[start:end] == text
    for an in a["anchors"]:
        par = a["paragraphs"][an["paragraph_id"]]
        assert par[an["start"]:an["end"]] == an["text"]
    assert [(an["text"], an["href"]) for an in a["anchors"]] == [
        ("B link", "B_page"), ("C & co", "C"),
    ]
    assert a["anchors"][0]["start"] == len("Intro with ")
    assert pages[1]["anchors"] == []


def test_extract_pages_multi_file_and_fill(spark, tmp_path):
    d = tmp_path / "shards"
    os.makedirs(d)
    (d / "wiki_00").write_text(SHARD_1, encoding="utf8")
    (d / "wiki_01").write_text(SHARD_2, encoding="utf8")

    pages = extract_wiki_pages(spark, str(d))
    assert pages.count() == 3
    assert check_anchor_offsets(pages) == 0

    # tag-stripped non-anchor markup flows into the paragraph text
    e = {r["page_id"]: r for r in pages.collect()}["3"]
    assert e["paragraphs"][0] == "Bold then ext and alpha."

    # KB: B_page resolves by title; Old%20Alpha by redirect; C unknown;
    # http anchor short-circuits 'simple'
    kb = spark.createDataFrame(
        [
            ("Q2", {"en": "B page"}, {"en": "d"}, {"en": "B page"}, {}),
            ("Q8", {"en": "Alpha"}, {"en": "d"}, {"en": "Alpha"}, {}),
        ],
        schema=schemas.ENTITY_KB,
    )
    tm, am = build_title_map(kb), build_alias_map(kb)
    closure = resolve_redirect_closure(spark.createDataFrame(
        [("en", "Old Alpha", "Alpha")], schema=schemas.REDIRECTS))

    anchors = anchor_rows(pages)
    amap = resolve_anchor_hrefs(anchors, tm, closure, am)
    got = {r["href"]: (r["resolved_qid"], r["provenance"])
           for r in amap.collect()}
    assert got["B_page"] == ("Q2", "wikipedia")      # '_'→' ' normalize
    assert got["Old%20Alpha"] == ("Q8", "wikipedia")  # unquote + chase
    assert got["C"] == (None, "wikidata")
    assert got["http://ext"] == (None, "simple")

    filled = fill_page_anchors(anchors, amap)
    assert filled.count() == 4

    m = anchors_solved_metrics(filled).collect()[0]
    # countable excludes the empty 'simple' http anchor → 2/3 solved
    assert m["n_anchors"] == 4 and m["n_countable"] == 3
    assert m["solved_ratio"] == round(2 / 3, 6)

    mc = {(r["mention"], r["qid"]): r["cnt"]
          for r in mention_counts_from_anchors(filled).collect()}
    assert mc == {("B link", "Q2"): 1, ("alpha", "Q8"): 1}
