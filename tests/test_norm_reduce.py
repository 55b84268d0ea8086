"""A4 word->mention code reduce: strategy semantics vs numpy, operator
vs driver-side function parity."""

from __future__ import annotations

import numpy as np

from ner_linking_demo_spark.operators.norm_reduce import (
    normalize_mentions,
    reduce_mention_code,
    word_code_probs,
)
from ner_linking_demo_spark.plans.entry_queries import _harness_gazetteer


def test_reduce_strategies():
    codes = ["c1", "c2", "c3"]
    words = ["alpha", "bravo", "charlie"]
    probs = np.stack([word_code_probs(w, codes) for w in words])
    assert np.allclose(probs.sum(axis=1), 1.0)
    for strategy, ref in (
        ("prod", probs.prod(axis=0)),
        ("sum", probs.sum(axis=0)),
        ("mean", probs.mean(axis=0)),
        ("max", probs.max(axis=0)),
        ("first", probs[0]),
    ):
        assert reduce_mention_code(words, codes, strategy) == codes[
            int(np.argmax(ref))
        ]
    # single-word mention: every strategy agrees
    single = {reduce_mention_code(["alpha"], codes, s)
              for s in ("prod", "sum", "mean", "max", "first")}
    assert len(single) == 1


def test_operator_matches_driver_fn(spark):
    gaz = _harness_gazetteer()
    mentions = spark.createDataFrame(
        [
            ("u1", "DISEASE", 0, 9, "hash join"),
            ("u1", "PROCEDURE", 10, 18, "group by"),
            ("u2", "DISEASE", 5, 20, "sort merge join"),
        ],
        ["url", "label", "start", "end", "span"],
    )
    got = {
        (r.url, r.span): r.norm_code
        for r in normalize_mentions(mentions, gaz).collect()
    }
    codes_by_label = {
        str(label).upper(): [str(c) for c in sub["code"]]
        for label, sub in gaz.groupby("label")
    }
    for (url, span), code in got.items():
        label = "DISEASE" if span in ("hash join", "sort merge join") else "PROCEDURE"
        assert code == reduce_mention_code(
            span.split(), codes_by_label[label], "prod"
        )
    assert len(got) == 3
