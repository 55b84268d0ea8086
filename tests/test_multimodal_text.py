"""Multimodal plumbing + text-analysis columns."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ner_linking_demo_spark.functions import text_analysis as TA
from ner_linking_demo_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "el paciente presenta una evolución favorable con el tratamiento"),
        (1, "the quick brown fox jumps over the lazy dog in the park"),
        (2, "zzz !!! ??? ..."),
        (3, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lang_id(spark, docs):
    out = dict(
        docs.select(
            "doc_id", TA.lang_id(F.col("text")).alias("lang")
        ).collect()
    )
    assert out[0] == "es" and out[1] == "en" and out[2] == "unknown"
    assert out[3] == "unknown"


def test_token_counts(spark, docs):
    out = {
        r["doc_id"]: (r["n"], r["b"])
        for r in docs.select(
            "doc_id",
            TA.token_count(F.col("text")).alias("n"),
            TA.bpe_ish_token_count(F.col("text")).alias("b"),
        ).collect()
    }
    assert out[3] == (0, 0)
    assert out[1][0] == 12
    assert out[2][1] == 10  # letter-run + each punct char separately


def test_quality_and_fingerprint(spark, docs):
    out = docs.select(
        "doc_id",
        TA.quality_score(F.col("text")).alias("q"),
        TA.content_fingerprint(F.col("text")).alias("fp"),
    ).toPandas()
    q = dict(zip(out["doc_id"], out["q"]))
    assert q[0] > q[2]  # prose beats punctuation soup
    assert out["fp"].nunique() == 4
    # normalization: whitespace-collapsed variants share a fingerprint
    two = spark.createDataFrame(
        [(0, "Hola  Mundo"), (1, "hola mundo ")], ["i", "text"]
    )
    fps = two.select(TA.content_fingerprint(F.col("text"))).collect()
    assert fps[0][0] == fps[1][0]


def test_multimodal_features_plumbing(spark, docs):
    media = MM.media_from_documents(docs)
    feats = MM.extract_features(media, size_balance_partitions=2).toPandas()
    assert len(feats) == 4
    row = feats.set_index("doc_id").loc[1]
    assert row["n_bytes"] == len(
        "the quick brown fox jumps over the lazy dog in the park".encode()
    )
    f = np.array(row["features"])
    assert len(f) == 17 and abs(f[:16].sum() - 1.0) < 1e-5
    assert f[16] == row["n_bytes"]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")


def test_winnow_fingerprints_guarantee_and_shift_invariance(spark):
    """Winnowing guarantee (MOSS): documents sharing a substring of
    length >= w + k - 1 share at least one fingerprint REGARDLESS of
    alignment; unrelated docs share (essentially) none; deterministic."""
    import random

    from pyspark.sql import functions as F

    from ner_linking_demo_spark.functions.text_analysis import (
        winnow_fingerprints,
    )

    k, w = 8, 4
    rng = random.Random(5)
    alpha = "abcdefghij "
    common = "".join(rng.choice(alpha) for _ in range(k + w - 1 + 20))
    rows = []
    for i in range(6):
        prefix = "".join(rng.choice(alpha) for _ in range(rng.randrange(40)))
        suffix = "".join(rng.choice(alpha) for _ in range(rng.randrange(40)))
        rows.append((i, prefix + common + suffix))
    rows.append((100, "".join(rng.choice("zyxwvu") for _ in range(120))))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(k=k, w=w)
    got = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", fps(F.col("text")).alias("fp")
        ).collect()
    }
    base = got[0]
    for i in range(1, 6):  # every embedding of `common` shares >= 1 fp
        assert base & got[i], i
    assert not (base & got[100])  # disjoint alphabet -> no overlap

    # determinism across evaluations
    again = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", fps(F.col("text")).alias("fp")
        ).collect()
    }
    assert again == got

    # NULL and short texts survive
    edge = spark.createDataFrame(
        [(1, None), (2, "ab")], ["doc_id", "text"]
    ).select("doc_id", fps(F.col("text")).alias("fp")).collect()
    assert [r["fp"] for r in sorted(edge, key=lambda r: r["doc_id"])][0] == []
