"""Hashed-n-gram quality classifier: scoring determinism/parity,
distributed training convergence, and filter semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_linking_demo_spark.functions.quality_classifier import (
    QualityClassifier,
    classifier_quality_filter,
    quality_probability,
    train_quality_classifier,
)

CLEAN = [
    "the study presents a thorough analysis of the observed phenomena",
    "historical records describe the development of local institutions",
    "researchers documented significant findings in the annual report",
    "the committee published detailed guidance for practitioners",
    "an overview of methods used across comparative evaluations",
    "the archive preserves manuscripts from several early collections",
]
SPAM = [
    "click here buy now cheap deals click here buy now",
    "win win win free money free money claim prize now",
    "best price best price discount discount buy buy buy",
    "hot singles online now click click subscribe subscribe",
    "limited offer act now limited offer act now act now",
    "free free free gift card winner winner click now",
]


def _labeled(spark):
    rows = [(t, 1) for t in CLEAN] + [(t, 0) for t in SPAM]
    return spark.createDataFrame(rows, "text string, label int")


def test_scoring_matches_driver_reference_and_is_null_safe(spark):
    clf = QualityClassifier.seeded(dim=1 << 12, seed=3)
    texts = CLEAN[:2] + SPAM[:2]
    df = spark.createDataFrame(
        [(t,) for t in texts] + [(None,)], "text string"
    )
    got = [
        r[0]
        for r in df.select(
            quality_probability(clf, F.col("text"))
        ).collect()
    ]
    for t, p in zip(texts, got):
        assert p == pytest.approx(clf.score_one(t), abs=1e-12)
    assert got[-1] == 0.0  # NULL text scores 0, never crashes


def test_training_converges_and_separates(spark):
    labeled = _labeled(spark).repartition(4)
    clf, losses = train_quality_classifier(labeled, dim=1 << 12)
    assert losses[-1] < losses[0] * 0.5  # loss halves on separable data
    for t in CLEAN:
        assert clf.score_one(t) > 0.5, t
    for t in SPAM:
        assert clf.score_one(t) < 0.5, t


def test_training_deterministic_for_fixed_partitioning(spark):
    labeled = _labeled(spark).repartition(2)
    c1, l1 = train_quality_classifier(labeled, dim=1 << 10, epochs=5)
    c2, l2 = train_quality_classifier(labeled, dim=1 << 10, epochs=5)
    assert l1 == l2
    assert (c1.weights == c2.weights).all() and c1.bias == c2.bias


def test_filter_keeps_above_threshold(spark):
    labeled = _labeled(spark)
    clf, _ = train_quality_classifier(labeled, dim=1 << 12)
    docs = spark.createDataFrame(
        [(1, CLEAN[0]), (2, SPAM[0])], "doc_id long, text string"
    )
    kept = classifier_quality_filter(docs, clf, threshold=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    scored = classifier_quality_filter(
        docs, clf, threshold=0.0, keep_score=True
    )
    assert "quality_prob" in scored.columns


def test_training_raises_on_empty_input(spark):
    empty = spark.createDataFrame([], "text string, label int")
    with pytest.raises(ValueError, match="no labeled rows"):
        train_quality_classifier(empty, dim=1 << 8, epochs=1)


def test_content_free_docs_score_zero(spark):
    clf = QualityClassifier.seeded(dim=1 << 10, seed=1)
    df = spark.createDataFrame([("",), ("   ",), (None,)], "text string")
    got = [
        r[0]
        for r in df.select(quality_probability(clf, F.col("text"))).collect()
    ]
    assert got == [0.0, 0.0, 0.0]
    assert clf.score_one("") == 0.0 and clf.score_one(None) == 0.0


def test_null_label_raises_instead_of_poisoning(spark):
    rows = [("good text here", 1), ("bad text there", None)]
    labeled = spark.createDataFrame(rows, "text string, label int")
    # pyspark surfaces the executor-side ValueError wrapped; match on
    # the message, not the wrapper type
    with pytest.raises(Exception, match="labels must be 0 or 1"):
        train_quality_classifier(labeled, dim=1 << 8, epochs=1)


def test_save_load_roundtrip_exact(tmp_path):
    clf = QualityClassifier.seeded(dim=1 << 12, seed=11)
    # suffix-LESS path: np.savez would silently append .npz and break
    # the round-trip; save() must write to the exact path
    p = str(tmp_path / "model")
    clf.save(p)
    back = QualityClassifier.load(p)
    assert (back.weights == clf.weights).all()  # bit-exact, not approx
    assert back.bias == clf.bias
    assert back.fingerprint() == clf.fingerprint()
    for t in CLEAN[:2] + SPAM[:2]:
        assert back.score_one(t) == clf.score_one(t)


def test_fingerprint_pins_model_content():
    a = QualityClassifier.seeded(dim=1 << 10, seed=1)
    same = QualityClassifier(weights=a.weights.copy(), bias=a.bias)
    assert a.fingerprint() == same.fingerprint()
    w = a.weights.copy()
    w[0] += 1e-9  # any retrain-sized drift must change the pin
    assert QualityClassifier(weights=w, bias=a.bias).fingerprint() != a.fingerprint()
    assert (
        QualityClassifier(weights=a.weights, bias=a.bias + 1e-9).fingerprint()
        != a.fingerprint()
    )


def test_pipeline_learned_gate_and_retrain_invalidates_checkpoint(
    spark, tmp_path
):
    from ner_linking_demo_spark.plans.corpus_pipeline import (
        run_corpus_pipeline,
    )

    labeled = _labeled(spark)
    clf, _ = train_quality_classifier(labeled, dim=1 << 12)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CLEAN + SPAM)],
        "doc_id long, text string",
    )
    ckpt = str(tmp_path / "ckpt")
    kept_a = run_corpus_pipeline(
        spark, docs, quality_model=clf, near_dup=False,
        checkpoint_dir=ckpt, input_sig="qtest",
    ).kept
    assert sorted(r["doc_id"] for r in kept_a.collect()) == list(
        range(len(CLEAN))
    )
    assert "quality_prob" in kept_a.columns

    # an adversarial "retrain": flipped labels invert the gate. Same
    # checkpoint dir + input sig — only the model fingerprint differs,
    # so resuming the old snapshot would return CLEAN docs again.
    flipped = labeled.select("text", (1 - F.col("label")).alias("label"))
    clf2, _ = train_quality_classifier(flipped, dim=1 << 12)
    kept_b = run_corpus_pipeline(
        spark, docs, quality_model=clf2, near_dup=False,
        checkpoint_dir=ckpt, input_sig="qtest",
    ).kept
    assert sorted(r["doc_id"] for r in kept_b.collect()) == list(
        range(len(CLEAN), len(CLEAN) + len(SPAM))
    )
