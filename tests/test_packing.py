"""Sequence packing: python first-fit oracle parity, capacity/coverage
invariants, determinism, oversize handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from ner_linking_demo_spark.operators.packing import pack_sequences

SF_DIR = "/root/testdata/sf0.001"


def _oracle_firstfit(items, max_tokens):
    """(id, n_tok) sorted by id -> list of (doc_ids, total)."""
    bins = []
    for i, n in items:
        if n > max_tokens:
            bins.append([-1, [i], n])
            continue
        for b in bins:
            if b[0] >= n:
                b[0] -= n
                b[1].append(i)
                b[2] += n
                break
        else:
            bins.append([max_tokens - n, [i], n])
    return [(tuple(ids), tot) for _, ids, tot in bins]


def test_pack_matches_oracle_single_partition(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = pack_sequences(docs, max_tokens=128, num_partitions=1).collect()

    items = sorted(
        (r["doc_id"], r["n_tok"])
        for r in docs.select(
            "doc_id",
            F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
        ).collect()
    )
    want = _oracle_firstfit(items, 128)
    assert [(tuple(r["doc_ids"]), r["total_tokens"]) for r in
            sorted(got, key=lambda r: r["seq_id"])] == want


def test_pack_invariants_and_determinism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = pack_sequences(docs, max_tokens=200, num_partitions=4)
    rows = a.collect()
    # capacity: every non-oversize sequence fits; oversize = single doc
    for r in rows:
        if r["oversize"]:
            assert r["n_docs"] == 1
        else:
            assert r["total_tokens"] <= 200
    # coverage: every doc exactly once
    packed = [d for r in rows for d in r["doc_ids"]]
    assert sorted(packed) == sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )
    # determinism: same input + same partitioning -> identical packing
    b = pack_sequences(docs, max_tokens=200, num_partitions=4).collect()
    key = lambda r: r["seq_id"]
    assert [
        (r["seq_id"], tuple(r["doc_ids"])) for r in sorted(rows, key=key)
    ] == [(r["seq_id"], tuple(r["doc_ids"])) for r in sorted(b, key=key)]


def test_pack_oversize_flagged(spark):
    docs = spark.createDataFrame(
        [(1, "a " * 50), (2, "b " * 5), (3, "c " * 6)],
        ["doc_id", "text"],
    )
    rows = pack_sequences(docs, max_tokens=10, num_partitions=1).collect()
    over = [r for r in rows if r["oversize"]]
    assert len(over) == 1 and over[0]["doc_ids"] == [1]
    normal = [r for r in rows if not r["oversize"]]
    assert sorted(d for r in normal for d in r["doc_ids"]) == [2, 3]
