"""Preconditions the kg_* DuckDB oracles rely on (plans/kg_oracles.py
module docstring) — asserted against the real testdata + harness
gazetteer so a data or gazetteer change that breaks an oracle assumption
fails HERE with an explanation, not as an opaque hash mismatch."""

from __future__ import annotations

import re

import duckdb
import pytest

from ner_linking_demo_spark.plans.entry_queries import _harness_gazetteer
from ner_linking_demo_spark.plans import kg_oracles as KG
from tests.conftest import TESTDATA_SF001


@pytest.fixture(scope="module")
def doc_texts():
    con = duckdb.connect()
    return [
        r[0]
        for r in con.execute(
            f"SELECT text FROM '{TESTDATA_SF001}/documents.parquet'"
        ).fetchall()
    ]


def test_precondition_tokenization_is_prefix_sum(doc_texts):
    """Docs must be lowercase, trimmed, single-space-joined, [a-z0-9 ] —
    then the engine's offset tokenizer degenerates to whitespace split
    with prefix-sum offsets, which is what the SQL reproduces."""
    assert doc_texts
    for t in doc_texts:
        assert t == t.strip()
        assert "  " not in t
        assert re.fullmatch(r"[a-z0-9 ]+", t), t[:80]


def test_precondition_matcher_scan_is_pure_join():
    """Per label: no term starts with a token that appears at a non-start
    position of any same-label term, and no term is a token-prefix of
    another — longest-match + non-overlap-consume are then no-ops."""
    gaz = _harness_gazetteer()
    for label, sub in gaz.groupby("label"):
        seqs = [tuple(t.split()) for t in sub["term"]]
        starts = {s[0] for s in seqs}
        inner = {tok for s in seqs for tok in s[1:]}
        assert not (starts & inner), (label, starts & inner)
        for a in seqs:
            for b in seqs:
                if a != b:
                    assert b[: len(a)] != a, (a, b)


def test_oracle_matches_engine_offsets(spark, doc_texts):
    """Spot-check: the SQL mention offsets equal the engine tokenizer's
    offsets on real testdata text (guards the prefix-sum assumption end
    to end, without the driver)."""
    from ner_linking_demo_spark.functions.tokenization import (
        words_with_offsets,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{TESTDATA_SF001}/documents.parquet'"
    )
    sql = f"WITH {KG._otok_ctes('WHERE doc_id < 5')} SELECT * FROM otok"
    got = con.execute(sql).df()
    docs = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 5"
    ).fetchall()
    for doc_id, text in docs:
        url = f"doc://{doc_id}"
        sub = got[got["url"] == url].sort_values("pos")
        expect = words_with_offsets(text)
        assert list(sub["w"]) == [w for w, _, _ in expect]
        assert list(sub["start"]) == [s for _, s, _ in expect]
