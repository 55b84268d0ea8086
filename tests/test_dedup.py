"""Dedup family: planted-duplicate recall/precision + signature
equivalence between the expression-form and corpus-scale MinHash paths."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ner_linking_demo_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    base = (
        "el paciente presenta una evolución favorable con tratamiento "
        "de la zona afectada y control periódico según protocolo"
    )
    for i in range(40):
        rows.append((i, f"{base} variante {i} " + "palabra " * (i % 5)))
    # exact duplicates of docs 0-4
    for i in range(5):
        rows.append((100 + i, rows[i][1]))
    # near duplicates of docs 10-14 (one token prefix edit)
    for i in range(5):
        rows.append((200 + i, "xx " + rows[10 + i][1]))
    # unrelated
    rows.append((300, "zzz qqq www eee rrr ttt yyy uuu"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, corpus):
    out = DD.exact_dedup(corpus).toPandas()
    dups = out[out["dup_count"] > 1]
    assert set(dups["doc_id"]) == {0, 1, 2, 3, 4}  # min-id representatives
    assert (dups["dup_count"] == 2).all()
    assert len(out) == corpus.count() - 5


def test_minhash_lsh_finds_planted_dups(spark, corpus):
    pairs = DD.minhash_lsh_pairs(
        corpus, n_hashes=16, bands=4, jaccard_threshold=0.5
    ).toPandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    for i in range(5):
        assert (i, 100 + i) in found  # exact dups (jaccard 1.0)
        assert (10 + i, 200 + i) in found  # near dups
    assert pairs["jaccard"].between(0, 1).all()


def test_minhash_df_vs_expression_form(spark, corpus):
    """Both MinHash formulations must agree on band collisions: identical
    texts -> identical signatures."""
    sigs = DD.minhash_signatures_df(corpus, n_hashes=8).toPandas()
    by_id = dict(zip(sigs["id"], sigs["sig"].map(tuple)))
    for i in range(5):
        assert by_id[i] == by_id[100 + i]
    expr = (
        corpus.select(
            "doc_id",
            DD.minhash_signature(F.col("text"), n_hashes=8).alias("sig"),
        )
        .toPandas()
    )
    by_id_e = dict(zip(expr["doc_id"], expr["sig"].map(tuple)))
    for i in range(5):
        assert by_id_e[i] == by_id_e[100 + i]


def test_simhash_banding_guard(spark, corpus):
    # max_hamming=6 with 32/8=4 bands would silently miss qualifying pairs
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bands"):
        DD.simhash_neardup_pairs(corpus, max_hamming=6)


def test_simhash_near_dups_close(spark, corpus):
    # band_bits=4 -> 8 bands > max_hamming=6: pigeonhole guarantee holds
    pairs = DD.simhash_neardup_pairs(corpus, max_hamming=6, band_bits=4).toPandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    for i in range(5):
        assert (i, 100 + i) in found
    # exact dups have hamming 0
    zero = pairs[pairs["hamming"] == 0]
    assert {(a, b) for a, b in zip(zero["id_a"], zero["id_b"])} >= {
        (i, 100 + i) for i in range(5)
    }


def test_ngram_jaccard_pairs(spark, corpus):
    pairs = DD.ngram_jaccard_pairs(
        corpus, block_col=None, n=4, threshold=0.9
    ).toPandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert {(i, 100 + i) for i in range(5)} <= found
    assert (300, 301) not in found


def test_embedding_neardup(spark):
    rows = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [0.999, 0.01, 0.0]),
        (2, 0, [0.0, 1.0, 0.0]),
        (3, 1, [1.0, 0.0, 0.0]),  # other block: never paired with 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    pairs = DD.embedding_neardup_pairs(df, threshold=0.99).toPandas()
    found = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert found == {(0, 1)}


def test_lsh_bucket_stats(spark, corpus):
    stats = DD.lsh_bucket_stats(corpus, n_hashes=16, bands=4).toPandas()
    assert len(stats) == 4
    assert (stats["max_bucket"] >= 2).all()  # planted dups collide
