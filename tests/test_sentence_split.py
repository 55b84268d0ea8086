"""S9 sentence-split scan + SS-aware fragment packing."""

from __future__ import annotations

from ner_linking_demo_spark.functions.fragments import fragment_document
from ner_linking_demo_spark.sources.sentence_split import (
    read_sentence_splits,
)

TEXT = "alpha bravo charlie delta echo foxtrot"
# sentences: [0,19) = first three words, [20,38) = last three
SS = [(0, 19), (20, 38)]


def test_ss_scan(spark, tmp_path):
    (tmp_path / "doc7.txt").write_text("0\t19\n20\t38\n")
    (tmp_path / "doc8.txt").write_text("5\t9\n")
    got = {
        r.doc_id: [(p.start, p.end) for p in r.ss]
        for r in read_sentence_splits(spark, str(tmp_path / "*.txt")).collect()
    }
    assert got == {"doc7": [(0, 19), (20, 38)], "doc8": [(5, 9)]}


def test_ss_fragments_never_cross_sentences():
    frags = fragment_document(TEXT, seq_len=128, ss=SS)
    assert len(frags) == 2  # one fragment per sentence (both fit)
    for frag, (s, e) in zip(frags, SS):
        starts = [o[0] for o, w in zip(frag.offsets, frag.word_ids) if w >= 0]
        assert all(s <= st < e for st in starts), (frag.subtokens, s, e)


def test_ss_flat_content_equals_greedy():
    greedy = fragment_document(TEXT, seq_len=128)
    ss = fragment_document(TEXT, seq_len=128, ss=SS)

    def flat(frags):
        return [
            (t, w, o)
            for f in frags
            for t, w, o in zip(f.subtokens, f.word_ids, f.offsets)
            if w >= 0
        ]

    assert flat(greedy) == flat(ss)


def test_ss_long_sentence_still_chunks():
    # a sentence longer than the fragment budget splits within itself
    frags = fragment_document(TEXT, seq_len=6, ss=[(0, 38)])  # max_eff=4
    assert len(frags) > 1
    starts = [o[0] for f in frags for o, w in zip(f.offsets, f.word_ids) if w >= 0]
    assert starts == sorted(starts)


def test_ss_tail_after_last_sentence():
    # words after the final sentence end are packed as a trailing run
    frags = fragment_document(TEXT, seq_len=128, ss=[(0, 19)])
    assert len(frags) == 2
    tail_starts = [o[0] for o, w in zip(frags[1].offsets, frags[1].word_ids) if w >= 0]
    assert min(tail_starts) >= 19
