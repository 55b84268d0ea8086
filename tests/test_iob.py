"""IOB decode: windowed formulation == reference-shaped scanner, on random
tag sequences and on tags synthesized from golden mentions."""

from __future__ import annotations

import random

from ner_linking_demo_spark.functions.tokenization import words_with_offsets
from ner_linking_demo_spark.operators.iob import decode_iob_scan, decode_iob_spans


def _random_docs(n_docs: int, seed: int):
    rng = random.Random(seed)
    docs = []
    for d in range(n_docs):
        n = rng.randint(0, 40)
        labels = [rng.choice(["B", "I", "O", "O", "I"]) for _ in range(n)]
        offsets = []
        pos = 0
        for _ in range(n):
            w = rng.randint(1, 8)
            offsets.append((pos, pos + w))
            pos += w + 1
        docs.append((f"u{d}", labels, offsets))
    return docs


def test_windowed_matches_scanner(spark):
    docs = _random_docs(60, seed=3)
    rows = [
        (url, i, lab, s, e)
        for url, labels, offsets in docs
        for i, (lab, (s, e)) in enumerate(zip(labels, offsets))
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["url", "pos", "iob", "start", "end"])
    got = {
        (r["url"], r["start"], r["end"])
        for r in decode_iob_spans(df).collect()
    }
    want = {
        (url, s, e)
        for url, labels, offsets in docs
        for s, e in decode_iob_scan(labels, offsets)
    }
    assert got == want


def test_scanner_on_gold_mentions(clinical_case, gold_mentions):
    """Tags synthesized from gold mention offsets decode back to exactly
    the gold spans (round trip through word-level IOB)."""
    words = words_with_offsets(clinical_case)
    for r in gold_mentions.itertuples():
        labels = []
        offsets = []
        inside = False
        for w, s, e in words:
            offsets.append((s, e))
            if s >= r.start and e <= r.end:
                labels.append("I" if inside else "B")
                inside = True
            else:
                labels.append("O")
                inside = False
        spans = decode_iob_scan(labels, offsets)
        assert (r.start, r.end) in spans


def test_orphan_inside_skipped():
    labels = ["I", "O", "B", "I", "O", "I", "B"]
    offsets = [(i * 2, i * 2 + 1) for i in range(7)]
    assert decode_iob_scan(labels, offsets) == [(4, 7), (12, 13)]


def test_discontinuous_windowed_equals_scanner(spark):
    """Random tag sequences: the gaps-and-islands DataFrame decode equals
    the reference-shaped discontinuous scanner."""
    import random

    from ner_linking_demo_spark.operators.iob import (
        decode_iob_scan_discontinuous,
        decode_iob_spans_discontinuous,
    )

    rng = random.Random(5)
    rows, expect = [], set()
    for d in range(40):
        n = rng.randint(1, 25)
        labels = [rng.choice("BIO") for _ in range(n)]
        offsets = [(i * 10, i * 10 + 5) for i in range(n)]
        for i, lab in enumerate(labels):
            rows.append((f"d{d}", i, lab, offsets[i][0], offsets[i][1]))
        for frags in decode_iob_scan_discontinuous(labels, offsets):
            loc = ";".join(f"{s} {e}" for s, e in frags)
            expect.add((f"d{d}", loc, frags[0][0], frags[-1][1]))
    words = spark.createDataFrame(
        rows, "url string, pos int, iob string, start int, end int"
    )
    got = {
        (r.url, r.location, r.start, r.end)
        for r in decode_iob_spans_discontinuous(words).collect()
    }
    assert got == expect
