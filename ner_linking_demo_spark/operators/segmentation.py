"""Giant-page handling: split oversized documents into overlapping
segments so one 100x page can't straggle a partition (north_rule "giant
pages"; SURVEY.md §7 step 7 "fragment-level parallelism inside UDF
batches").

Semantics-preserving for dictionary NER: segments split at whitespace
boundaries with an overlap of ``overlap_words`` words (>= the longest
gazetteer term), so every mention lies entirely inside at least one
segment; duplicate detections in overlaps collapse on the unique mention
key. Char offsets are rebased with the segment's base offset, so the
output is byte-identical to unsegmented detection (tested).

The split itself is a UDTF-shaped mapInPandas (one page row -> n segment
rows) — no driver involvement, no full-text shuffle beyond the segments
themselves.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("seg_id", T.IntegerType(), False),
        T.StructField("base", T.IntegerType(), False),
        T.StructField("owned_end", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def split_text(
    text: str, max_chars: int, overlap_words: int
) -> list[tuple[int, int, str]]:
    """[(base_offset, owned_end_offset, segment_text)].

    Segments split at whitespace; consecutive segments overlap by
    ``overlap_words`` words. Each segment *owns* mention starts in
    ``[base, owned_end)``; the owned ranges partition the document, and
    every owned start has >= overlap_words words of lookahead inside its
    segment — so any mention of <= overlap_words words that starts in an
    owned range lies fully inside the owning segment.

    Caveat (documented, not handled): the left-to-right longest-match
    scanner restarts at each segment base with no left context, so an
    adversarial chain of adjacent matches straddling a boundary can
    differ from the full-document scan. Requires a term crossing the
    boundary immediately followed by a conflicting term — not observed on
    fixtures; the unsegmented operator remains the semantics of record.
    """
    if len(text) <= max_chars:
        return [(0, len(text), text)]
    starts = [0]
    for i in range(1, len(text)):
        if text[i - 1].isspace() and not text[i].isspace():
            starts.append(i)
    n_words = len(starts)
    segs: list[tuple[int, int, str]] = []
    w = 0
    while w < n_words:
        base = starts[w]
        end_w = w
        while end_w < n_words and starts[end_w] - base < max_chars:
            end_w += 1
        if end_w >= n_words:
            segs.append((base, len(text), text[base:]))
            break
        next_w = max(end_w - overlap_words, w + 1)
        seg_end = starts[end_w]
        owned_end = starts[next_w]
        segs.append((base, owned_end, text[base:seg_end]))
        w = next_w
    return segs


def segment_pages(
    pages: DataFrame,
    max_chars: int = 20_000,
    overlap_words: int = 16,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """pages -> segments(url, seg_id, base, text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text in zip(pdf[url_col], pdf[text_col]):
                for i, (base, owned_end, seg) in enumerate(
                    split_text(text, max_chars, overlap_words)
                ):
                    rows.append((url, i, base, owned_end, seg))
            yield pd.DataFrame(
                rows, columns=["url", "seg_id", "base", "owned_end", "text"]
            )

    return pages.select(url_col, text_col).mapInPandas(
        run, schema=SEGMENTS_SCHEMA
    )


def detect_mentions_segmented(
    pages: DataFrame,
    gazetteer_pdf,
    max_chars: int = 20_000,
    overlap_words: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Giant-page-safe NER: segment -> rebalance segments -> detect with
    rebased offsets -> dedupe overlap double-detections. Byte-identical
    output to operators.ner.detect_mentions (tested), but partitions by
    *segment*, so a giant page parallelizes across executors."""
    from ..functions.matcher import DictionaryMatcher, term_key

    spark = pages.sparkSession
    if overlap_words is None:
        overlap_words = max(
            (len(term_key(t)) for t in gazetteer_pdf["term"]), default=4
        )
    segs = segment_pages(
        pages, max_chars=max_chars, overlap_words=overlap_words
    )
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    segs = segs.repartition(n, F.col("url"), F.col("seg_id"))

    terms_by_label = {
        str(label): list(sub["term"])
        for label, sub in gazetteer_pdf.groupby("label")
    }
    bc = spark.sparkContext.broadcast(terms_by_label)

    from .ner import MENTIONS_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = DictionaryMatcher(bc.value)
        for pdf in batches:
            rows = []
            for url, base, owned_end, text in zip(
                pdf["url"], pdf["base"], pdf["owned_end"], pdf["text"]
            ):
                for label, start, end, span in matcher.find_mentions(text):
                    abs_start = int(base) + start
                    # ownership filter: the overlap tail belongs to the
                    # next segment (prevents truncated spurious matches)
                    if abs_start < int(owned_end):
                        rows.append(
                            (url, label.upper(), abs_start,
                             int(base) + end, span)
                        )
            yield pd.DataFrame(
                rows, columns=["url", "label", "start", "end", "span"]
            )

    return segs.mapInPandas(run, schema=MENTIONS_SCHEMA)
