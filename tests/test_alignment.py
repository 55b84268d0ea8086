"""J2 alignment: reference rule edge cases + cogroup operator parity."""

from __future__ import annotations

import pytest

from ner_linking_demo_spark.operators.alignment import (
    align_annotations_to_words,
    align_words,
)

WORDS = [("alpha", 0, 5), ("bravo", 6, 11), ("charlie", 12, 19)]


def test_align_words_rule():
    # exact word boundaries
    assert align_words(WORDS, [(6, 11)]) == ["O", "B", "O"]
    # mid-word start/end still cover the word (last start <=, first end >=)
    assert align_words(WORDS, [(7, 10)]) == ["O", "B", "O"]
    # spanning annotation, ends mid-word
    assert align_words(WORDS, [(1, 13)]) == ["B", "I", "I"]
    # two non-overlapping annotations
    assert align_words(WORDS, [(0, 5), (12, 19)]) == ["B", "O", "B"]
    with pytest.raises(AssertionError, match="overlap"):
        align_words(WORDS, [(0, 11), (6, 19)])
    with pytest.raises(ValueError, match="outside"):
        align_words(WORDS, [(-5, -1)])


def test_cogroup_operator(spark):
    pages = spark.createDataFrame(
        [("u1", "alpha bravo charlie"), ("u2", "delta echo")],
        ["url", "text"],
    )
    anns = spark.createDataFrame(
        [("u1", 6, 11)], ["url", "start", "end"]
    )  # u2 has no annotations: all O
    got = {
        (r.url, r.pos): (r.word, r.start, r.end, r.iob)
        for r in align_annotations_to_words(pages, anns).collect()
    }
    assert got[("u1", 2)] == ("bravo", 6, 11, "B")
    assert got[("u1", 1)][3] == "O" and got[("u1", 3)][3] == "O"
    assert got[("u2", 1)][3] == "O" and got[("u2", 2)][3] == "O"
    assert len(got) == 5
