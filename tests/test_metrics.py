"""Metrics suite (A6-A14) vs hand-computed goldens."""

from kgpipe.metrics import (
    anchors_solved_ratio,
    confusion_long,
    el_running_metrics,
    global_lang_frequency,
    multi_seed_table,
    per_word_errors,
    recall_at_k,
    relaxed_overlap_matrix,
    span_prf,
)


def test_confusion_long(spark):
    df = spark.createDataFrame(
        [("A", "A"), ("A", "B"), ("A", "A"), ("B", "B")],
        "true_label string, pred_label string",
    )
    out = {(r["true_label"], r["pred_label"]): r["n"]
           for r in confusion_long(df).collect()}
    assert out == {("A", "A"): 2, ("A", "B"): 1, ("B", "B"): 1}


def test_span_prf_strong_and_weak(spark):
    gold = spark.createDataFrame(
        [("d1", 0, 2, "PER"), ("d1", 5, 1, "LOC")],
        "doc_id string, start int, length int, label string",
    )
    pred = spark.createDataFrame(
        [("d1", 0, 2, "PER"), ("d1", 6, 1, "LOC"), ("d1", 9, 1, "ORG")],
        "doc_id string, start int, length int, label string",
    )
    strong = span_prf(pred, gold, "strong")
    assert strong["tp"] == 1
    assert abs(strong["precision"] - 1 / 3) < 1e-9
    assert abs(strong["recall"] - 1 / 2) < 1e-9
    # weak: (d1,6,1,LOC) overlaps gold (5,1): 5 <= 6 <= 6 ✓
    weak = span_prf(pred, gold, "weak")
    assert weak["tp"] == 2


def test_recall_at_k(spark):
    df = spark.createDataFrame(
        [(["Q1", "Q2"], "Q1"), (["Q3", "Q1"], "Q1"), (["Q9"], "Q1")],
        "genre_prediction array<string>, gold_qid string",
    )
    r = recall_at_k(df, ks=(1, 2)).collect()[0]
    # output is rounded to 6 decimals
    assert abs(r["r_at_1"] - 1 / 3) < 1e-6
    assert abs(r["r_at_2"] - 2 / 3) < 1e-6


def test_el_running_metrics(spark):
    df = spark.createDataFrame(
        [(["Q1"], ["Q1", "Q2"]), (["Q3"], ["Q4"])],
        "genre_prediction array<string>, gold_qids array<string>",
    )
    r = el_running_metrics(df).collect()[0]
    assert r["accuracy"] == 0.5 and r["n"] == 2


def test_per_word_errors_ordering(spark):
    rows = [
        ("obama", "B-PER", "B-PER"),  # tp
        ("the", "O", "B-ORG"),        # fp
        ("the", "O", "O"),            # tn
        ("paris", "B-LOC", "O"),      # fn
        ("paris", "B-LOC", "B-ORG"),  # fn (wrong type)
    ]
    df = spark.createDataFrame(rows, "word string, gold_tag string, pred_tag string")
    out = per_word_errors(df).collect()
    assert out[0]["word"] == "paris" and out[0]["fn"] == 2
    by_word = {r["word"]: r for r in out}
    assert by_word["the"]["fp"] == 1 and by_word["the"]["tn"] == 1
    assert by_word["obama"]["tp"] == 1


def test_multi_seed_table_outlier_drop(spark):
    rows = [
        ("d1", 0, 80.0, 82.0, 78.0),
        ("d1", 1, 84.0, 85.0, 83.0),
        ("d1", 2, 1.0, 1.0, 1.0),  # f1 < 5 → dropped (eval_utils.py:441)
    ]
    df = spark.createDataFrame(
        rows, "dataset string, seed int, f1 double, precision double, recall double"
    )
    out = multi_seed_table(df).collect()[0]
    assert out["n_runs"] == 2 and out["f1_mean"] == 82.0


def test_anchors_solved_and_lang_freq(spark):
    df = spark.createDataFrame(
        [(["Q1"],), (["Q1", "Q2"],), (["Q3"],)], "qids array<string>"
    )
    r = anchors_solved_ratio(df).collect()[0]
    assert abs(r["solved_ratio"] - 2 / 3) < 1e-6

    lf = spark.createDataFrame(
        [(["en", "de"],), (["en"],)], "langs array<string>"
    )
    out = [(r["lang"], r["n"]) for r in global_lang_frequency(lf).collect()]
    assert out == [("en", 2), ("de", 1)]


def test_relaxed_overlap_matrix(spark):
    gold = spark.createDataFrame(
        [("d1", 0, 3, "PER")], "doc_id string, start int, end int, label string"
    )
    pred = spark.createDataFrame(
        [("d1", 2, 4, "ORG"), ("d1", 5, 6, "PER")],
        "doc_id string, start int, end int, label string",
    )
    out = {(r["gold_type"], r["pred_type"]): r["n"]
           for r in relaxed_overlap_matrix(pred, gold).collect()}
    assert out == {("PER", "ORG"): 1}  # (5,6) doesn't overlap (0,3)


def test_align_gold_pred_padding(spark):
    from kgpipe.metrics import align_gold_pred

    gold = spark.createDataFrame(
        [(0, 0, "a", "B-X"), (0, 1, "b", "O"), (0, 2, "c", "I-X")],
        "sentence_id int, token_idx int, word string, tag string",
    )
    pred = spark.createDataFrame(
        [(0, 0, "a", "B-X"), (0, 1, "b", "B-Y")],
        "sentence_id int, token_idx int, word string, tag string",
    )
    out = {r["token_idx"]: (r["gold_tag"], r["pred_tag"])
           for r in align_gold_pred(gold, pred).collect()}
    assert out == {0: ("B-X", "B-X"), 1: ("O", "B-Y"), 2: ("I-X", "O")}


def test_per_class_report_hand_computed(spark):
    """seqeval classification_report semantics: strict span tuples.
    gold: PER×3, LOC×1;  pred: PER×2 (1 correct), LOC×2 (1 correct).
    PER: p=1/2, r=1/3, f1=0.4; LOC: p=1/2, r=1/1, f1=2/3.
    micro: tp=2, p=2/4, r=2/4, f1=0.5. macro: p=0.5, r=2/3, f1=8/15.
    """
    from kgpipe.metrics import per_class_report

    schema = "doc_id string, start int, length int, label string"
    gold = spark.createDataFrame(
        [("d1", 0, 2, "PER"), ("d1", 5, 1, "PER"), ("d2", 0, 1, "PER"),
         ("d2", 3, 2, "LOC")], schema)
    pred = spark.createDataFrame(
        [("d1", 0, 2, "PER"), ("d1", 7, 1, "PER"),
         ("d2", 3, 2, "LOC"), ("d2", 9, 1, "LOC")], schema)
    out = {r["label"]: (r["precision"], r["recall"], r["f1"], r["support"])
           for r in per_class_report(pred, gold).collect()}
    assert out["PER"] == (0.5, round(1 / 3, 6), 0.4, 3)
    assert out["LOC"] == (0.5, 1.0, round(2 / 3, 6), 1)
    assert out["_micro"] == (0.5, 0.5, 0.5, 4)
    assert out["_macro"] == (0.5, round((1 / 3 + 1) / 2, 6),
                             round((0.4 + 2 / 3) / 2, 6), 4)


def test_per_class_report_class_only_in_pred(spark):
    from kgpipe.metrics import per_class_report

    schema = "doc_id string, start int, length int, label string"
    gold = spark.createDataFrame([("d1", 0, 1, "PER")], schema)
    pred = spark.createDataFrame([("d1", 0, 1, "ORG")], schema)
    out = {r["label"]: (r["precision"], r["recall"], r["support"])
           for r in per_class_report(pred, gold).collect()}
    assert out["ORG"] == (0.0, 0.0, 0)   # no gold support, pure FP
    assert out["PER"] == (0.0, 0.0, 1)


def test_token_accuracy(spark):
    from kgpipe.metrics import token_accuracy

    df = spark.createDataFrame(
        [("B-X", "B-X"), ("O", "O"), ("O", "B-Y"), ("I-X", "O")],
        "gold_tag string, pred_tag string",
    )
    r = token_accuracy(df).collect()[0]
    assert (r["token_accuracy"], r["n_tokens"]) == (0.5, 4)
