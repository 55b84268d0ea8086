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


def test_packer_matches_firstfit_when_unbounded():
    """GreedyPacker with close_below=0 and a huge cap IS pure first-fit."""
    import random

    from ner_linking_demo_spark.operators.packing import GreedyPacker

    rng = random.Random(7)
    items = [(i, rng.randrange(1, 130)) for i in range(2000)]
    p = GreedyPacker(128, max_open_bins=10**9, close_below=0)
    rows = []
    for i, n in items:
        rows.extend(p.add(i, n))
    rows.extend(p.flush())
    rows.sort(key=lambda r: r[0])
    assert [(tuple(r[1]), r[3]) for r in rows] == _oracle_firstfit(
        items, 128
    )


def test_open_bins_bounded_adversarial():
    """Mostly-full windows (the worst case for first-fit's probe list):
    every doc nearly fills a window, so no bin ever naturally closes —
    the cap must bound both the probe list and the retained state."""
    from ner_linking_demo_spark.operators.packing import GreedyPacker

    p = GreedyPacker(100, max_open_bins=8, close_below=1)
    rows = []
    n_docs = 10_000
    for i in range(n_docs):
        rows.extend(p.add(i, 95))
    rows.extend(p.flush())
    assert p.max_open_seen <= 8
    # coverage + capacity survive the retirement policy
    packed = sorted(d for r in rows for d in r[1])
    assert packed == list(range(n_docs))
    assert all(r[3] <= 100 for r in rows)
    # ordinals unique (ids assigned at creation, not at close)
    assert len({r[0] for r in rows}) == len(rows)


def test_pack_streaming_emission_spark(spark):
    """Spark-side run with an adversarial fixture and a tiny cap:
    retirement + per-batch emission keep invariants and determinism."""
    docs = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        # 95 of every 100 docs nearly fill the window; 5 tiny
        F.when(F.col("id") % 100 < 95, 95).otherwise(3).alias("n_tok"),
    )
    a = pack_sequences(
        docs, max_tokens=100, tokens_col="n_tok", num_partitions=4,
        max_open_bins=8,
    ).collect()
    packed = sorted(d for r in a for d in r["doc_ids"])
    assert packed == list(range(3000))
    assert all(r["total_tokens"] <= 100 for r in a)
    b = pack_sequences(
        docs, max_tokens=100, tokens_col="n_tok", num_partitions=4,
        max_open_bins=8,
    ).collect()
    key = lambda r: r["seq_id"]
    assert [(r["seq_id"], tuple(r["doc_ids"])) for r in sorted(a, key=key)] \
        == [(r["seq_id"], tuple(r["doc_ids"])) for r in sorted(b, key=key)]


def test_packer_hypothesis_invariants():
    """Property test over random item streams: (a) unbounded packer ==
    pure first-fit exactly; (b) bounded packer preserves coverage,
    capacity, unique creation ordinals and the open-bin cap, for any
    input including 0-token and oversize docs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ner_linking_demo_spark.operators.packing import GreedyPacker

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=180), max_size=120),
        st.integers(min_value=1, max_value=8),
    )
    def check(tokens, cap):
        items = list(enumerate(tokens))
        # (a) exact first-fit parity (close_below=0 keeps full bins
        # open, matching the oracle even for 0-token docs)
        p = GreedyPacker(100, max_open_bins=10**9, close_below=0)
        rows = []
        for i, n in items:
            rows.extend(p.add(i, n))
        rows.extend(p.flush())
        rows.sort(key=lambda r: r[0])
        assert [(tuple(r[1]), r[3]) for r in rows] == _oracle_firstfit(
            items, 100
        )
        # (b) bounded-cap invariants
        p2 = GreedyPacker(100, max_open_bins=cap, close_below=1)
        rows2 = []
        for i, n in items:
            rows2.extend(p2.add(i, n))
        rows2.extend(p2.flush())
        assert p2.max_open_seen <= cap
        assert sorted(d for r in rows2 for d in r[1]) == sorted(
            i for i, _ in items
        )
        assert all(r[3] <= 100 or r[4] for r in rows2)
        assert len({r[0] for r in rows2}) == len(rows2)

    check()
