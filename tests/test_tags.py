"""Unit tests for tag operators vs hand-computed goldens replicating
reference semantics (tag_encoding.py, eval_utils.py:47-69)."""

from kgpipe.tags import (
    fix_tags,
    merge_gap_tags,
    pad_predictions,
    rewrite_labels,
    to_bilou,
    to_iob,
    to_iob2,
)


def test_iob2_from_iob():
    # IOB1: I- opens a span unless adjacent same-type span
    assert to_iob2(["I-PER", "I-PER", "O", "I-LOC"]) == \
        ["B-PER", "I-PER", "O", "B-LOC"]


def test_iob2_orphan_i_and_type_change():
    assert to_iob2(["I-PER", "I-LOC", "I-LOC"]) == ["B-PER", "B-LOC", "I-LOC"]


def test_iob2_from_bilou():
    assert to_iob2(["B-PER", "L-PER", "U-LOC", "O"]) == \
        ["B-PER", "I-PER", "B-LOC", "O"]


def test_iob2_idempotent():
    tags = ["B-PER", "I-PER", "O", "B-PER", "B-LOC"]
    assert to_iob2(tags) == tags


def test_iob_from_iob2():
    # B only between adjacent same-type spans
    assert to_iob(["B-PER", "I-PER", "B-PER", "O", "B-LOC"]) == \
        ["I-PER", "I-PER", "B-PER", "O", "I-LOC"]


def test_bilou_roundtrip():
    assert to_bilou(["B-PER", "I-PER", "O", "B-LOC"]) == \
        ["B-PER", "L-PER", "O", "U-LOC"]
    assert to_bilou(["B-PER", "I-PER", "I-PER"]) == \
        ["B-PER", "I-PER", "L-PER"]


def test_merge_gap_tags_chain():
    # B I O I → gap filled; chains close up forward in-place
    assert merge_gap_tags(["B-X", "I-X", "O", "I-X"]) == \
        ["B-X", "I-X", "I-X", "I-X"]
    assert merge_gap_tags(["B-X", "O", "I-X", "O", "I-X"]) == \
        ["B-X", "I-X", "I-X", "I-X", "I-X"]
    # different types: no merge
    assert merge_gap_tags(["B-X", "O", "I-Y"]) == ["B-X", "O", "I-Y"]


def test_fix_tags():
    assert fix_tags(["I-X", "O", "I-X"], merge_tags=False) == \
        ["B-X", "O", "B-X"]


def test_pad_predictions():
    assert pad_predictions(["B-X"], 3) == ["B-X", "O", "O"]
    try:
        pad_predictions(["B-X", "O"], 1)
        assert False
    except ValueError:
        pass


def test_rewrite_dispatcher():
    assert rewrite_labels(["U-X"], "bilou") == ["U-X"]
    assert rewrite_labels(["U-X"], "IOB2") == ["B-X"]
