"""A4: word -> mention normalization-code reduce (reference
`/root/reference/server/ner/src/utils/ner/post_process.py:114-141,
381-396` — the IOB-Norm joint path): each word in a detected mention
carries a probability vector over the label's normalization codes; the
mention's code = argmax of the strategy-reduced (max / prod / sum /
mean / first) word probabilities.

The demo path does not exercise it (dictionary linking instead), so it
was declared out of scope in round 1; covered here with the same
surrogate discipline as the M2 chain: per-(word, code) probabilities are
a softmax over md5 hash logits, making the whole reduce cross-checkable
in DuckDB SQL. A real joint NER+Norm head drops into
``word_code_probs``'s seat without operator changes.

Spark shape: mention-grain Arrow-batched UDF (the word -> code tensors
never shuffle — same in-UDF posture as the reference, which reduces
inside the extraction loop).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

NORM_SALT = "norm"


def word_code_logits(word: str, codes: list[str], salt: str = NORM_SALT) -> list[float]:
    """Hash pseudo-logit per (word, code): md5('{salt}|{word}|{code}')
    first 8 hex digits / 2^32-1 (same construction as piece_logits)."""
    return [
        int(
            hashlib.md5(f"{salt}|{word}|{c}".encode()).hexdigest()[:8], 16
        )
        / 0xFFFFFFFF
        for c in codes
    ]


def word_code_probs(word: str, codes: list[str]) -> np.ndarray:
    es = [math.exp(x) for x in word_code_logits(word, codes)]
    s = 0.0
    for e in es:  # fixed left-to-right order (oracle parity)
        s += e
    return np.array([e / s for e in es])


def reduce_mention_code(
    span_words: list[str], codes: list[str], strategy: str = "prod"
) -> str:
    """Strategy-reduce the words' code-probability rows, argmax with the
    reference's lowest-ordinal tie-break (np.argmax)."""
    probs = np.stack([word_code_probs(w, codes) for w in span_words])
    if strategy == "prod":
        agg = probs.prod(axis=0)
    elif strategy == "sum":
        agg = probs.sum(axis=0)
    elif strategy == "mean":
        agg = probs.mean(axis=0)
    elif strategy == "max":
        agg = probs.max(axis=0)
    elif strategy == "first":
        agg = probs[0]
    else:
        raise ValueError(f"unknown reduce strategy: {strategy!r}")
    return codes[int(np.argmax(agg))]


NORMALIZED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("span", T.StringType(), False),
        T.StructField("norm_code", T.StringType(), True),
    ]
)


def normalize_mentions(
    mentions: DataFrame,
    gazetteer_pdf,
    strategy: str = "prod",
) -> DataFrame:
    """mentions(url, label, start, end, span) -> + norm_code.

    Code vocabulary per label = the gazetteer's codes in row order
    (ordinal = tie-break order); the word tensor reduce happens in-UDF at
    mention grain (no word-grain shuffle)."""
    spark = mentions.sparkSession
    codes_by_label = {
        # dedupe codes keeping first-occurrence order: multi-synonym
        # gazetteers repeat codes, which would double-count them in the
        # prod/sum reduces (and shift the argmax ordinal tie-break)
        str(label).upper(): list(dict.fromkeys(str(c) for c in sub["code"]))
        for label, sub in gazetteer_pdf.groupby("label")
    }
    bc = spark.sparkContext.broadcast((codes_by_label, strategy))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cbl, strat = bc.value
        for pdf in batches:
            out = pdf[["url", "label", "start", "end", "span"]].copy()
            # labels absent from the gazetteer (e.g. SPAN from the token
            # classifier, or an external mentions table) null-code rather
            # than KeyError inside the UDF
            out["norm_code"] = [
                reduce_mention_code(span.split(), cbl[label], strat)
                if label in cbl
                else None
                for span, label in zip(pdf["span"], pdf["label"])
            ]
            yield out

    return mentions.select("url", "label", "start", "end", "span").mapInPandas(
        run, schema=NORMALIZED_SCHEMA
    )
