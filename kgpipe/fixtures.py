"""Deterministic synthetic fixtures (FIXTURES.md §1-§6, seed=42).

Everything is derived from a small in-memory entity catalog; transcripts
are generated *distributed* (spark.range over conversations →
mapInPandas) so the same generator scales from 1k turns (unit tests) to
600k turns (bench) without a driver-side bottleneck — each conversation
is a pure function of its conv index, independent of partitioning.

Edge cases baked in (FIXTURES.md "Edge cases" list):
 - head entity (index 0) with Zipf boost > 10% of mentions → skew path
 - shared ambiguous aliases across 2-8 QIDs → top-k candidate cap
 - every 11th entity is a disambiguation page → acceptance fall-through
 - every 13th entity lacks English coverage → sentinel path at lang=en,
   entities with en-only coverage → EN-fallback path at lang=de
 - redirect chains of depth 4 and one 2-cycle → bounded chase
 - mentions at turn start / turn end, adjacent mentions
"""

from __future__ import annotations

import itertools
import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from kgpipe import schemas
from kgpipe.tags import FINE_CATEGORIES

SEED = 42

# Lowercase token vocab for filler text, MultiCoNER-style
# (data_examples/context-enriched.json uses fully lowercased turns).
FILLER = (
    "the a of and to in for on with about show me find tell what when how "
    "please run check look report from that this it was is are were been "
    "did does had city song film drug team car game tool agent step plan "
    "result answer query table note item list case work time year day"
).split()

NAME_PARTS = (
    "lil eli berg stone marl iker vega nora chen ada kato mira juno pax "
    "rook sable tali umber vint wren yara zeno quill orin pike lumo gale "
    "fenn dara cobb"
).split()

# one keyword per fine category — descriptions embed it so the
# deterministic classifier (classify.py) can key on it.
CAT_KEYWORD = {c: c.lower().replace("/", "-") for c in FINE_CATEGORIES}

LANG_POOL = [l for l in schemas.LANGUAGES2SAVE if l != "en"]


@dataclass
class Entity:
    idx: int
    qid: str
    fine_cat: str
    surfaces: list  # list[str] lowercase surface forms (canonical first)
    langs: list  # language coverage (labels/descriptions/sitelinks)
    is_disambig: bool = False
    arg_qids: list = field(default_factory=list)  # [(prop, arg_qid)]


@dataclass
class Catalog:
    entities: list
    class_entities: list  # (qid, label) used as P31/P106/P279 objects
    n_entities: int

    def mention_weights(self):
        """Zipf weights with a boosted head entity (skew fixture)."""
        w = [1.0 / (i + 1) for i in range(self.n_entities)]
        w[0] = sum(w) * 0.15
        return w


def build_catalog(n_entities: int = 300, n_class: int = 40) -> Catalog:
    rng = random.Random(SEED)
    class_entities = []
    for j in range(n_class):
        # class items (e.g. "human", "company") — objects of P31/P106/P279
        label = f"{NAME_PARTS[j % len(NAME_PARTS)]}kind{j}"
        class_entities.append((f"Q{9000000 + j * 3}", label))

    shared_aliases = [f"amble{k}" for k in range(max(4, n_entities // 10))]
    entities = []
    for i in range(n_entities):
        qid = f"Q{100 + i * 7}"  # non-sequential ids; numeric-max tiebreak matters
        fine_cat = FINE_CATEGORIES[i % len(FINE_CATEGORIES)]
        n_tok = 1 + (i % 3)
        canonical = " ".join(
            NAME_PARTS[(i * 5 + t * 11) % len(NAME_PARTS)] for t in range(n_tok)
        )
        if i % 13 == 5:
            # no-English entities get a collision-free canonical so the
            # sentinel path (Q0 + "No wikidata summary found") is
            # guaranteed to be exercised (FIXTURES.md edge case 4)
            canonical = f"{canonical} uniq{i}"
        surfaces = [canonical]
        if n_tok > 1:
            surfaces.append(canonical.split(" ")[0])  # short form → ambiguity
        if i % 7 == 0:
            surfaces.append(shared_aliases[(i // 7) % len(shared_aliases)])

        if i % 13 == 5:
            langs = rng.sample(LANG_POOL, 2)  # no English at all → sentinel at lang=en
        elif i % 13 == 9:
            langs = ["en"]  # en-only → exercises EN fallback at lang=de
        else:
            langs = ["en"] + rng.sample(LANG_POOL, 2)

        arg_qids = [("P31", class_entities[i % n_class][0])]
        if fine_cat in ("Scientist", "Artist", "Athlete", "Politician", "Cleric",
                        "SportsManager", "OtherPER"):
            arg_qids.append(("P106", class_entities[(i + 3) % n_class][0]))
        if i % 4 == 0:
            arg_qids.append(("P279", class_entities[(i + 7) % n_class][0]))

        entities.append(Entity(
            idx=i, qid=qid, fine_cat=fine_cat, surfaces=surfaces, langs=langs,
            is_disambig=(i % 11 == 3), arg_qids=arg_qids,
        ))
    return Catalog(entities=entities, class_entities=class_entities,
                   n_entities=n_entities)


def _title_for(ent: Entity, lang: str) -> str:
    # wikipedia sitelink title; distinct per language
    base = ent.surfaces[0].title()
    return base if lang == "en" else f"{base} ({lang})"


def _label_for(ent: Entity, lang: str) -> str:
    # wikidata label (get_wikidata_info reads labels as "wikipedia_titles")
    base = ent.surfaces[0].title()
    return base if lang == "en" else f"{base} [{lang}]"


def _description_for(ent: Entity, lang: str) -> str:
    if ent.is_disambig:
        return "Wikimedia disambiguation page"
    return f"{CAT_KEYWORD[ent.fine_cat]} known as {ent.surfaces[0]} ({lang})"


# ------------------------------------------------------------------ dims

def entity_kb_df(spark: SparkSession, catalog: Catalog) -> DataFrame:
    rows = []
    for e in catalog.entities:
        rows.append((
            e.qid,
            {l: _label_for(e, l) for l in e.langs},
            {l: _description_for(e, l) for l in e.langs},
            {l: _title_for(e, l) for l in e.langs},
            {l: [s for s in e.surfaces[1:]] for l in e.langs if e.surfaces[1:]},
        ))
    for qid, label in catalog.class_entities:
        rows.append((qid, {"en": label}, {"en": f"class of {label}"},
                     {"en": label.title()}, {}))
    return spark.createDataFrame(rows, schema=schemas.ENTITY_KB)


def kb_args_df(spark: SparkSession, catalog: Catalog) -> DataFrame:
    rows = []
    for e in catalog.entities:
        for ordn, (prop, arg) in enumerate(e.arg_qids):
            rows.append((e.qid, prop, arg, ordn))
    return spark.createDataFrame(rows, schema=schemas.KB_ARGS)


def redirects_df(spark: SparkSession, catalog: Catalog) -> DataFrame:
    """Redirect fixtures: simple hop, a depth-4 chain, and a 2-cycle
    (bounded-chase test, GENRE/genre/utils.py:454-459)."""
    rows = []
    for e in catalog.entities:
        if e.idx % 10 == 2 and "en" in e.langs:
            rows.append(("en", f"Old {_title_for(e, 'en')}", _title_for(e, "en")))
    e0 = catalog.entities[4]
    t0 = _title_for(e0, e0.langs[0])
    rows += [
        (e0.langs[0], "Chain D", "Chain C"),
        (e0.langs[0], "Chain C", "Chain B"),
        (e0.langs[0], "Chain B", "Chain A"),
        (e0.langs[0], "Chain A", t0),
        ("en", "Loop A", "Loop B"),
        ("en", "Loop B", "Loop A"),
    ]
    return spark.createDataFrame(rows, schema=schemas.REDIRECTS)


def mention_counts_df(spark: SparkSession, catalog: Catalog) -> DataFrame:
    """mention→QID Zipfian anchor counts (preprocess_mention_dicts.py
    semantics: counts over corpus anchors; here deterministic closed form)."""
    rows = []
    for e in catalog.entities:
        for si, s in enumerate(e.surfaces):
            cnt = max(1, 5000 // (e.idx + 1) - si * 3 + (e.idx * 13) % 7)
            rows.append((s, e.qid, cnt))
    return spark.createDataFrame(rows, schema=schemas.MENTION_COUNTS)


def wiki_summaries_df(spark: SparkSession, catalog: Catalog) -> DataFrame:
    """Summary dim keyed by the wikidata *label* (the reference passes the
    label returned by get_wikidata_info as page title — get_wikidata.py:189,
    316-325). Every 6th entity has no summary → sentinel."""
    rows = []
    for e in catalog.entities:
        if e.is_disambig:
            continue
        for l in e.langs:
            if e.idx % 6 == 1:
                continue
            rows.append((_label_for(e, l),
                         f"summary of {e.surfaces[0]}: {CAT_KEYWORD[e.fine_cat]} page"))
    return spark.createDataFrame(rows, schema=schemas.WIKI_SUMMARIES)


# ------------------------------------------------------------- transcripts

def _gen_conversation(conv: int, catalog_surfaces, weights):
    """Pure function conv index → list of turn rows. catalog_surfaces is
    [(fine_cat, [surface, ...])] aligned with weights."""
    rng = random.Random(f"{SEED}-conv-{conv}")
    n_turns = 3 + rng.randrange(10)
    base_ts = datetime(2026, 1, 1, tzinfo=timezone.utc) + timedelta(hours=conv % 8760)
    rows = []
    roles = ["user", "assistant", "tool"]
    for t in range(n_turns):
        n_fill = 4 + rng.randrange(11)
        tokens = [FILLER[rng.randrange(len(FILLER))] for _ in range(n_fill)]
        n_m = rng.choices([0, 1, 2, 3], weights=[20, 50, 22, 8])[0]
        positions = sorted(rng.randrange(n_fill + 1) for _ in range(n_m))
        for p in reversed(positions):
            ei = rng.choices(range(len(catalog_surfaces)), weights=weights)[0]
            surfs = catalog_surfaces[ei][1]
            surface = surfs[rng.randrange(len(surfs))]
            tokens[p:p] = surface.split(" ")
        role = roles[t % 3]
        rows.append((
            f"conv-{conv:07d}", t, role, " ".join(tokens),
            f"tool{conv % 5}" if role == "tool" else None,
            base_ts + timedelta(minutes=t),
        ))
    return rows


def transcripts_df(spark: SparkSession, catalog: Catalog, n_convs: int = 120) -> DataFrame:
    """Distributed deterministic transcript generation: each partition
    materializes its conv range; rows are a pure function of conv index."""
    catalog_surfaces = [(e.fine_cat, e.surfaces) for e in catalog.entities]
    weights = catalog.mention_weights()

    def gen(iterator):
        for pdf in iterator:
            out = []
            for conv in pdf["id"]:
                out.extend(_gen_conversation(int(conv), catalog_surfaces, weights))
            yield pd.DataFrame(out, columns=["conv_id", "turn_idx", "role",
                                             "text", "tool", "ts"])

    n_parts = max(4, min(64, n_convs // 64 or 4))
    return (
        spark.range(n_convs)
        .repartition(n_parts)
        .mapInPandas(gen, schema=schemas.TRANSCRIPTS)
    )


def full_fixture_set(spark: SparkSession, n_convs: int = 120,
                     n_entities: int = 300) -> dict:
    catalog = build_catalog(n_entities=n_entities)
    return {
        "catalog": catalog,
        "transcripts": transcripts_df(spark, catalog, n_convs=n_convs),
        "entity_kb": entity_kb_df(spark, catalog),
        "kb_args": kb_args_df(spark, catalog),
        "redirects": redirects_df(spark, catalog),
        "mention_counts": mention_counts_df(spark, catalog),
        "wiki_summaries": wiki_summaries_df(spark, catalog),
    }
