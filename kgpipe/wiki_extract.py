"""S4: Wikipedia-extractor page scan + anchor-dict build driver
(SURVEY.md §2.1 S4, §2.4 J11, §2.5 A13; reference
GENRE/genre/utils.py:393-436 extract_pages,
GENRE/scripts_mgenre/preprocess_extract.py:57-94,
GENRE/scripts_mgenre/preprocess_anchors.py:105-171).

The reference parses wikiextractor output (`<doc id=…>` blocks, one
page across many lines, `<a href=…>` anchors inline) into
{page_id: {title, url, paragraphs[], anchors[]}} dicts, one file per
thread. Spark-first: one wholetext row per extractor shard →
mapInPandas stateful block parser (Arrow-batched; a shard is the unit
of parallelism exactly as the reference's ThreadPoolExecutor) → pages
rows with nested paragraph/anchor arrays. Anchor offsets are CHARACTER
offsets into the tag-stripped paragraph, satisfying the reference's
self-check `paragraphs[paragraph_id][start:end] == text`
(preprocess_mgenre.py:152-164).

Downstream, `resolve_anchor_hrefs` is the reference's `solve` step
(one cascade probe per DISTINCT href — the memoization the reference
gets from dict keying) and `fill_page_anchors` is the `fill` step
(J11: decorate every anchor row from the href map).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANCHOR_STRUCT = ("struct<text:string,href:string,paragraph_id:int,"
                 "start:int,end:int>")
PAGES_SCHEMA = (
    "page_id string, title string, url string, "
    f"paragraphs array<string>, anchors array<{ANCHOR_STRUCT}>"
)


class _LineParser(HTMLParser):
    """Tag-stripping line parser mirroring the reference's BeautifulSoup
    walk (utils.py:412-435): all text (entities unescaped) flows into
    the paragraph; <a href=…> spans additionally record (text, href,
    char start/end in the stripped paragraph)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.text: list[str] = []
        self.length = 0
        self.anchors: list[dict] = []
        self._href = None
        self._a_start = 0
        self._a_text: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            href = dict(attrs).get("href")
            if href:
                self._href = href
                self._a_start = self.length
                self._a_text = []

    def handle_endtag(self, tag):
        if tag == "a" and self._href is not None:
            txt = "".join(self._a_text)
            self.anchors.append({
                "text": txt, "href": self._href,
                "start": self._a_start, "end": self._a_start + len(txt),
            })
            self._href = None

    def handle_data(self, data):
        self.text.append(data)
        self.length += len(data)
        if self._href is not None:
            self._a_text.append(data)


def parse_extractor_text(content: str) -> list[dict]:
    """One extractor shard → list of page dicts (pure function; the
    reference's extract_pages loop, utils.py:393-436)."""
    pages: list[dict] = []
    doc = None
    for line in content.split("\n"):
        if line.startswith("<doc id="):
            doc = dict(ET.fromstring("{}{}".format(line, "</doc>")).attrib)
            doc["paragraphs"] = []
            doc["anchors"] = []
        elif line.startswith("</doc>"):
            if doc is not None:
                pages.append(doc)
                doc = None
        elif doc is not None:
            pid = len(doc["paragraphs"])
            p = _LineParser()
            p.feed(line)
            p.close()
            doc["paragraphs"].append("".join(p.text))
            for a in p.anchors:
                a["paragraph_id"] = pid
                doc["anchors"].append(a)
    return pages


def extract_wiki_pages(spark: SparkSession, path: str) -> DataFrame:
    """Wikiextractor shards under `path` → pages DataFrame. One
    wholetext row per shard file; the stateful block parse runs inside
    an Arrow-batched mapInPandas (a <doc> never spans files)."""
    files = spark.read.text(path, wholetext=True).select("value")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["value"]:
                for d in parse_extractor_text(content):
                    rows.append((
                        d.get("id"), d.get("title"), d.get("url"),
                        d["paragraphs"],
                        [(a["text"], a["href"], a["paragraph_id"],
                          a["start"], a["end"]) for a in d["anchors"]],
                    ))
            yield pd.DataFrame(rows, columns=[
                "page_id", "title", "url", "paragraphs", "anchors"])

    return files.mapInPandas(parse, schema=PAGES_SCHEMA)


def anchor_rows(pages: DataFrame) -> DataFrame:
    """Explode pages → one row per anchor occurrence."""
    return pages.select(
        "page_id", "title", F.explode("anchors").alias("a")
    ).select(
        "page_id", "title",
        F.col("a.text").alias("text"), F.col("a.href").alias("href"),
        F.col("a.paragraph_id").alias("paragraph_id"),
        F.col("a.start").alias("start"), F.col("a.end").alias("end"),
    )


def check_anchor_offsets(pages: DataFrame) -> int:
    """The reference's offset self-check (preprocess_mgenre.py:152-164):
    paragraphs[paragraph_id][start:end] == text for every anchor.
    Returns the violation count (0 = all good)."""
    return (
        anchor_rows(pages)
        .join(pages.select("page_id", "paragraphs"), "page_id")
        .filter(
            F.expr("substring(paragraphs[paragraph_id], start + 1,"
                   " end - start)") != F.col("text")
        )
        .count()
    )


def resolve_anchor_hrefs(anchors: DataFrame, title_map: DataFrame,
                         redirect_closure: DataFrame, alias_map: DataFrame,
                         lang: str = "en") -> DataFrame:
    """The 'solve' step (preprocess_anchors.py:105-113): run the J4
    cascade ONCE per distinct href — the relational form of the
    reference's dict-keyed memoization — producing the anchors_map
    (href, resolved_qids, resolved_qid, provenance)."""
    from kgpipe.kb import resolution_cascade

    distinct_hrefs = anchors.select(
        F.lit(lang).alias("lang"), F.col("href").alias("anchor")
    ).distinct()
    return resolution_cascade(
        distinct_hrefs, title_map, redirect_closure, alias_map
    ).select(F.col("anchor").alias("href"),
             "resolved_qids", "resolved_qid", "provenance")


def fill_page_anchors(anchors: DataFrame, anchors_map: DataFrame) -> DataFrame:
    """The 'fill' step (J11, preprocess_anchors.py:124-155): decorate
    every anchor occurrence from the href map — broadcast join."""
    return anchors.join(F.broadcast(anchors_map), "href", "left")


def anchors_solved_metrics(filled: DataFrame) -> DataFrame:
    """A13 exactly as logged by the reference
    (preprocess_anchors.py:157-171): solved = |qids|==1; total excludes
    (empty ∧ 'simple') anchors."""
    countable = F.when(
        ~((F.size("resolved_qids") == 0) & (F.col("provenance") == "simple")),
        1,
    ).otherwise(0)
    return filled.agg(
        F.round(
            F.sum(F.when(F.size("resolved_qids") == 1, 1).otherwise(0))
            / F.sum(countable), 6
        ).alias("solved_ratio"),
        F.sum(countable).cast("long").alias("n_countable"),
        F.count("*").alias("n_anchors"),
    )


def mention_counts_from_anchors(filled: DataFrame) -> DataFrame:
    """A3 producer: anchor surface text × resolved QID → counts (the
    mention2wikidataID dictionary, preprocess_mention_dicts.py:106-108),
    over solved anchors only."""
    from kgpipe.kb import build_mention_counts

    solved = filled.filter(F.col("resolved_qid").isNotNull()).select(
        F.col("text").alias("mention"), F.col("resolved_qid").alias("qid")
    )
    return build_mention_counts(solved)
