"""J2: char-offset -> word alignment (reference
`/root/reference/server/ner/src/utils/ner/pre_process.py:600-620`):
an annotation's word range is [last word whose start <= ann.start,
first word whose end >= ann.end]; the first word gets B, the rest I —
the step that turns BRAT annotations (sources/brat.py) into word-level
IOB training labels. Training-only in the reference; covered because it
completes the training-data-production path (pages + annotations ->
labeled words), the complement of the inference IOB decode (M3).

Spark shape: ``cogroup(...).applyInPandas`` — pages and annotations
grouped on url meet in one pandas call per document; alignment is numpy
searchsorted inside the UDF (word grain never shuffles)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

LABELED_WORDS_SCHEMA = (
    "url string, pos int, word string, start int, end int, iob string"
)


def align_words(
    words: list[tuple[str, int, int]], anns: list[tuple[int, int]]
) -> list[str]:
    """Reference alignment rule on one document's words; annotations are
    expected non-overlapping (asserted, as in the reference)."""
    starts = np.array([s for _, s, _ in words], dtype=np.int64)
    ends = np.array([e for _, _, e in words], dtype=np.int64)
    labels = ["O"] * len(words)
    for a_start, a_end in sorted(anns):
        covering_start = np.where(starts <= a_start)[0]
        covering_end = np.where(ends >= a_end)[0]
        if len(covering_start) == 0 or len(covering_end) == 0:
            raise ValueError(f"annotation ({a_start},{a_end}) outside text")
        tok_start = int(covering_start[-1])
        tok_end = int(covering_end[0])
        assert tok_start <= tok_end, (a_start, a_end)
        assert labels[tok_start] == "O", "overlapping annotations"
        labels[tok_start] = "B"
        for i in range(tok_start + 1, tok_end + 1):
            labels[i] = "I"
    return labels


def align_annotations_to_words(
    pages: DataFrame,
    annotations: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """pages(url, text) x annotations(url, start, end) ->
    labeled words (url, pos, word, start, end, iob)."""
    from ..functions.tokenization import words_with_offsets

    def fn(key, pages_pdf: pd.DataFrame, anns_pdf: pd.DataFrame):
        rows = []
        anns = list(zip(anns_pdf["start"], anns_pdf["end"]))
        for url, text in zip(pages_pdf[url_col], pages_pdf[text_col]):
            words = words_with_offsets(text)
            labels = align_words(words, anns)
            for pos, ((w, s, e), lab) in enumerate(
                zip(words, labels), start=1
            ):
                rows.append((url, pos, w, s, e, lab))
        return pd.DataFrame(
            rows, columns=["url", "pos", "word", "start", "end", "iob"]
        )

    return (
        pages.select(url_col, text_col)
        .groupBy(url_col)
        .cogroup(annotations.select(url_col, "start", "end").groupBy(url_col))
        .applyInPandas(fn, schema=LABELED_WORDS_SCHEMA)
    )
