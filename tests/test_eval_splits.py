"""Unseen-mention / unseen-code evaluation splits (round-5 verdict item
4): split_metrics vs an independent pandas oracle on a planted fixture
where the four strata have known, different scores."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ner_linking_demo_spark.functions.evaluation import split_metrics

# fixture design: mention surface / gold codes chosen so that every
# (mention_seen x code_seen) cell is populated and no two strata share
# a score. pred codes are ranked lists; k=2 is scored.
MENTIONS = [
    # url, start, end, label, span, gold_codes, pred_codes
    ("u1", 0, 5, "D", "fiebre", ["C1"], ["C1", "C9", "C3"]),  # seen/seen hit@1
    ("u1", 10, 18, "D", "Fiebre  ", ["C2"], ["C9", "C2"]),  # seen(norm)/seen hit@2
    ("u2", 0, 7, "D", "disnea", ["C7"], ["C1", "C2"]),  # unseen-m/unseen-c miss
    ("u2", 9, 14, "D", "tos", ["C1", "C7"], ["C1", "C8"]),  # unseen-m/unseen-c(partial) hit
    ("u3", 0, 4, "D", "fiebre", ["C8"], ["C8"]),  # seen-m/unseen-c hit@1
    ("u3", 6, 12, "D", "vertigo", ["C2"], ["C3", "C2", "C1"]),  # unseen-m/seen-c hit@2
    ("u3", 14, 20, "D", "vertigo", ["C3"], ["C9", "C8"]),  # unseen-m/seen-c miss
]
TRAIN_MENTIONS = ["fiebre", "cefalea"]
TRAIN_CODES = ["C1", "C2", "C3"]
K = 2


def _oracle() -> pd.DataFrame:
    rows = []
    for _, _, _, _, span, gold, pred in MENTIONS:
        topk = pred[:K]
        inter = len(set(topk) & set(gold))
        p = inter / max(min(len(topk), K), 1)
        r = inter / max(len(gold), 1)
        acc = 1.0 if inter > 0 else 0.0
        m_seen = span.strip().lower() in TRAIN_MENTIONS
        c_seen = all(c in TRAIN_CODES for c in gold)
        splits = [
            "all",
            "seen_mention" if m_seen else "unseen_mention",
            "seen_code" if c_seen else "unseen_code",
        ]
        for s in splits:
            rows.append((s, p, r, acc))
    df = pd.DataFrame(rows, columns=["split", "p", "r", "acc"])
    return (
        df.groupby("split")
        .agg(
            p_at_k=("p", "mean"),
            r_at_k=("r", "mean"),
            acc_at_k=("acc", "mean"),
            n=("p", "size"),
        )
        .reset_index()
        .sort_values("split")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def frames(spark):
    pred = spark.createDataFrame(
        pd.DataFrame(
            [(u, s, e, l, pc) for u, s, e, l, _, _, pc in MENTIONS],
            columns=["url", "start", "end", "label", "codes"],
        )
    )
    gold = spark.createDataFrame(
        pd.DataFrame(
            [(u, s, e, l, sp, gc) for u, s, e, l, sp, gc, _ in MENTIONS],
            columns=["url", "start", "end", "label", "span", "gold_codes"],
        )
    )
    tm = spark.createDataFrame(
        pd.DataFrame({"term": TRAIN_MENTIONS})
    )
    tc = spark.createDataFrame(pd.DataFrame({"code": TRAIN_CODES}))
    return pred, gold, tm, tc


def test_split_metrics_matches_pandas_oracle(spark, frames):
    pred, gold, tm, tc = frames
    got = (
        split_metrics(pred, gold, tm, tc, k=K)
        .toPandas()
        .sort_values("split")
        .reset_index(drop=True)
    )
    want = _oracle()
    assert list(got["split"]) == list(want["split"])
    for col in ("p_at_k", "r_at_k", "acc_at_k"):
        np.testing.assert_allclose(got[col], want[col], atol=1e-12)
    assert list(got["n"].astype(int)) == list(want["n"].astype(int))
    # the fixture must actually exercise distinct stratum scores
    assert got.set_index("split")["acc_at_k"]["seen_mention"] != (
        got.set_index("split")["acc_at_k"]["unseen_mention"]
    )
    assert len(got) == 5


def test_strata_partition_the_mentions(spark, frames):
    pred, gold, tm, tc = frames
    got = split_metrics(pred, gold, tm, tc, k=K).toPandas().set_index("split")
    n_all = int(got.loc["all", "n"])
    assert (
        int(got.loc["seen_mention", "n"]) + int(got.loc["unseen_mention", "n"])
        == n_all
    )
    assert (
        int(got.loc["seen_code", "n"]) + int(got.loc["unseen_code", "n"])
        == n_all
    )


def test_empty_training_vocab_puts_everything_unseen(spark, frames):
    pred, gold, _, _ = frames
    empty_tm = spark.createDataFrame([], "term string")
    empty_tc = spark.createDataFrame([], "code string")
    got = (
        split_metrics(pred, gold, empty_tm, empty_tc, k=K)
        .toPandas()
        .set_index("split")
    )
    assert "seen_mention" not in got.index and "seen_code" not in got.index
    assert int(got.loc["unseen_mention", "n"]) == len(MENTIONS)
    assert int(got.loc["unseen_code", "n"]) == len(MENTIONS)
