"""Single-node pure-Python oracle executing reference semantics
(SURVEY.md §5 "our strategy").

This is the golden-generation twin of the Spark pipeline: the same
deterministic scorer/acceptance/classification rules, implemented as
plain row loops the way the reference does (run_genre.py /
get_wikidata.py / dataset.py), with no Spark involved. The Spark
pipeline must reproduce its (subj, pred, obj) set at P/R ≥ 0.95
(BASELINE.json north_rule; exact-tuple strong semantics,
GENRE/genre/utils.py:284-285).
"""

from __future__ import annotations

import math
import unicodedata
from collections import defaultdict

from kgpipe.classify import DEFAULT_KEYWORDS
from kgpipe.mentions import build_gazetteer, _tag_tokens, group_spans
from kgpipe.schemas import (
    LANGUAGES2SAVE,
    NO_WIKIDATA_SUMMARY,
    NO_WIKIPEDIA_SUMMARY,
    NO_WIKIPEDIA_TITLE,
    PROP2PRED,
    PROPS,
    Q0,
)

DISAMBIG = {"Wikimedia disambiguation page", "Wikimedia list article"}


def _qid_num(qid: str) -> int:
    return int(qid[1:])


def _normalize(text: str) -> str:
    return (
        unicodedata.normalize("NFKD", text).replace("•", "·").replace("．", "·")
    )


class OracleKB:
    """Dict-shaped KB mirroring the reference's pickled dicts."""

    def __init__(self, catalog):
        self.sitelinks = {}       # qid -> {lang: title}
        self.labels = {}          # qid -> {lang: label}
        self.descriptions = {}    # qid -> {lang: desc}
        self.mention_counts = defaultdict(dict)  # mention -> {qid: cnt}
        self.kb_args = defaultdict(list)         # qid -> [(prop, arg_qid)]
        self.summaries = {}       # title -> summary
        self.surfaces = set()

        from kgpipe import fixtures as fx

        for e in catalog.entities:
            self.sitelinks[e.qid] = {l: fx._title_for(e, l) for l in e.langs}
            self.labels[e.qid] = {l: fx._label_for(e, l) for l in e.langs}
            self.descriptions[e.qid] = {l: fx._description_for(e, l) for l in e.langs}
            for ordn, (prop, arg) in enumerate(e.arg_qids):
                self.kb_args[e.qid].append((prop, arg, ordn))
            for si, s in enumerate(e.surfaces):
                cnt = max(1, 5000 // (e.idx + 1) - si * 3 + (e.idx * 13) % 7)
                self.mention_counts[s][e.qid] = (
                    self.mention_counts[s].get(e.qid, 0) + cnt
                )
            for l in e.langs:
                if not e.is_disambig and e.idx % 6 != 1:
                    t = fx._label_for(e, l)
                    s = (f"summary of {e.surfaces[0]}: "
                         f"{fx.CAT_KEYWORD[e.fine_cat]} page")
                    # dict keyed by title; engine dedupes with min(summary)
                    self.summaries[t] = min(self.summaries.get(t, s), s)
            # alias_map surfaces: lowercased labels + aliases
            for l in e.langs:
                self.surfaces.add(fx._label_for(e, l).lower())
                for s in e.surfaces[1:]:
                    self.surfaces.add(s.lower())
            self.surfaces.update(e.surfaces)
        for qid, label in catalog.class_entities:
            self.labels[qid] = {"en": label}
            self.descriptions[qid] = {"en": f"class of {label}"}
            self.sitelinks[qid] = {"en": label.title()}
            self.surfaces.add(label.lower())

        # kb_context (get_wikidata.py cache shape)
        self.kb_context = {}
        for qid in self.labels:
            descs = self.descriptions.get(qid, {})
            if set(descs.values()) & DISAMBIG:
                self.kb_context[qid] = {"descriptions": {}, "arguments": [],
                                        "titles": {}}
                continue
            args = sorted(
                self.kb_args.get(qid, []),
                key=lambda t: (PROPS.index(t[0]), t[2]),
            )
            self.kb_context[qid] = {
                "descriptions": {l: d for l, d in descs.items()
                                 if l in LANGUAGES2SAVE},
                "arguments": [
                    (prop, {l: n for l, n in self.labels.get(arg, {}).items()
                            if l in LANGUAGES2SAVE})
                    for prop, arg, _ in args
                ],
                "titles": {l: t for l, t in self.labels.get(qid, {}).items()
                           if l in LANGUAGES2SAVE},
            }


def link_one(mention_text, ctx_tokens, kb: OracleKB,
             max_candidates=8, beam=8, lenpen=0.5):
    """Candidate gen (J5) + scoring + marginalization (A1) + rank (W2),
    mirroring candidates.py/linking.py formulas exactly."""
    norm = _normalize(mention_text)
    counts = defaultdict(int)
    for qid, c in kb.mention_counts.get(norm, {}).items():
        counts[qid] += c
    for qid, c in kb.mention_counts.get(norm.lower(), {}).items():
        counts[qid] += c
    cands = sorted(counts.items(), key=lambda x: (-x[1], _qid_num(x[0])))
    cands = cands[:max_candidates]
    if not cands:
        return [Q0]

    hyps = []
    ctx_set = set(ctx_tokens)
    for qid, cnt in cands:
        for lang, title in kb.sitelinks.get(qid, {}).items():
            hyp_text = f"{title} >> {lang}"
            hyp_len = len(hyp_text.split(" "))
            title_toks = title.lower().split(" ")
            overlap = len({t for t in title_toks if t in ctx_set}) / len(title_toks)
            score = (0.9 * math.log(1.0 + cnt) + 1.5 * overlap
                     - 0.35 * hyp_len - 3.0)
            hyps.append({"qid": qid, "text": hyp_text, "len": hyp_len,
                         "score": score})
    hyps.sort(key=lambda h: (-h["score"], h["text"]))
    hyps = hyps[:beam]
    if not hyps:
        return [Q0]

    per_qid = defaultdict(list)
    for h in hyps:
        per_qid[h["qid"]].append(h)
    ranked = []
    for qid, hs in per_qid.items():
        adj = [h["score"] * h["len"] / (h["len"] ** lenpen) for h in hs]
        mx = max(adj)
        m = mx + math.log(sum(math.exp(a - mx) for a in adj))
        ranked.append((qid, m))
    ranked.sort(key=lambda x: (-x[1], _qid_num(x[0])))
    return [q for q, _ in ranked]


def accept_one(prediction, kb: OracleKB, language="en"):
    """J7 acceptance with EN fallback + sentinels (get_wikidata.py:102-203)."""
    def attempt(lang):
        for qid in prediction:
            e = kb.kb_context.get(qid)
            if e and lang in e["titles"] and lang in e["descriptions"]:
                args = [labels[lang] for _, labels in e["arguments"]
                        if lang in labels]
                arg_pairs = [(prop, labels[lang]) for prop, labels in
                             e["arguments"] if lang in labels]
                return qid, lang, e["descriptions"][lang], args, arg_pairs, \
                    e["titles"][lang]
        return None

    hit = attempt(language)
    if hit is None and language != "en":
        hit = attempt("en")
    if hit is None:
        return None, None, NO_WIKIDATA_SUMMARY, [], [], NO_WIKIPEDIA_TITLE
    return hit


def classify_one(marked_text, wikidata_summary, arguments, wikipedia_summary,
                 include_summary=True, include_arguments=True,
                 include_wikipedia=True):
    """Deterministic keyword scorer (classify.py twin) with the
    dataset.py:50-55 feature ablation flags."""
    feat = marked_text.replace("[START]", "[START_ENT]").replace(
        "[END]", "[END_ENT]")
    if include_summary:
        feat += " [TAB] " + wikidata_summary
    if include_arguments:
        feat += " [TAB] " + ", ".join(arguments)
    if include_wikipedia:
        feat += " [TAB] " + wikipedia_summary
    toks = feat.lower().split(" ")
    best = min(
        ((-toks.count(kw), cat) for cat, kw in sorted(DEFAULT_KEYWORDS.items())),
    )
    return best[1]


def classify_one_ensemble(marked_text, wikidata_summary, arguments,
                          wikipedia_summary, n_variants=5):
    """A2 majority vote over feature-ablation variants
    (classify.classify_ensemble twin): count desc, label asc tiebreak."""
    from kgpipe.classify import FEATURE_VARIANTS

    labels = [
        classify_one(marked_text, wikidata_summary, arguments,
                     wikipedia_summary, s, a, w)
        for (s, a, w) in FEATURE_VARIANTS[:n_variants]
    ]
    return min((-labels.count(l), l) for l in set(labels))[1]


def oracle_triples(transcript_rows, catalog, language="en",
                   max_candidates=8, beam=8, ensemble_seeds=1) -> set:
    """transcript rows [(conv_id, turn_idx, text)] → set of (s, p, o)."""
    kb = OracleKB(catalog)
    gaz = build_gazetteer(sorted(kb.surfaces))
    triples = set()

    for conv_id, turn_idx, text in transcript_rows:
        tokens = text.split(" ")
        tags = _tag_tokens(tokens, gaz)
        spans = group_spans(tokens, tags)
        for eid, sp in enumerate(spans):
            mid = f"mention:{conv_id}/{turn_idx}/{eid}"
            s, e = sp["start"], sp["end"]
            marked = " ".join(
                tokens[:s] + ["[START]"] + tokens[s:e] + ["[END]"] + tokens[e:]
            )
            pred = link_one(sp["text"], tokens, kb,
                            max_candidates=max_candidates, beam=beam)
            qid, lang_used, summary, args, arg_pairs, wtitle = accept_one(
                pred, kb, language
            )
            wsummary = (
                NO_WIKIPEDIA_SUMMARY if wtitle == NO_WIKIPEDIA_TITLE
                else kb.summaries.get(wtitle, NO_WIKIPEDIA_SUMMARY)
            )
            if ensemble_seeds > 1:
                label = classify_one_ensemble(marked, summary, args, wsummary,
                                              n_variants=ensemble_seeds)
            else:
                label = classify_one(marked, summary, args, wsummary)

            triples.add((mid, "links_to", qid if qid else Q0))
            triples.add((mid, "has_category", label))
            triples.add((mid, "mentioned_in", f"{conv_id}/{turn_idx}/{s}/{e}"))
            if qid:
                for prop, arg_label in arg_pairs:
                    triples.add((qid, PROP2PRED[prop], arg_label))
                triples.add((qid, "described_as", summary))
                triples.add((qid, "titled", wtitle))
    return triples


def triple_prf(pred: set, gold: set) -> dict:
    """Strong exact-tuple P/R/F1 (GENRE/genre/utils.py:284-346)."""
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "tp": tp, "n_pred": len(pred), "n_gold": len(gold)}
