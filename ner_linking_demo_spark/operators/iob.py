"""M3/W8: IOB tag decode to continuous character spans.

Reference semantics (`/root/reference/server/ner/src/utils/ner/
post_process.py:449-490`, ``AnnExtractorContinuous`` with
``allow_inside_as_begin=False`` — the demo path): scan words left->right;
a span starts at a ``B`` and extends over the maximal run of following
``I`` rows; orphan ``I``s (no preceding ``B`` run) are skipped; span
char range = (start of first word, end of last word).

Two implementations:
- :func:`decode_iob_spans` — the **windowed DataFrame formulation**
  (SURVEY.md §2.5 W8: sessionize on the running count of ``B``s): no
  python in the path, scales to word-grain tables;
- :func:`decode_iob_scan` — the faithful per-document python scan
  (reference shape), used inside model UDFs and as the parity oracle.

Both are tested equal on random tag sequences. In the real-model NER UDF
the decode happens in-UDF at document grain (no word-grain shuffle,
SURVEY.md §2.4 A3 note); the windowed form exists for word-level tables
materialized by other tools.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def decode_iob_scan(
    labels: list[str], offsets: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Reference-shaped scanner: [(span_start, span_end)] from word-level
    IOB labels + word char offsets."""
    spans: list[tuple[int, int]] = []
    left = 0
    n = len(labels)
    while left < n:
        if labels[left] == "B":
            right = left + 1
            while right < n and labels[right] == "I":
                right += 1
            spans.append((offsets[left][0], offsets[right - 1][1]))
            left = right
        else:
            left += 1
    return spans


def decode_iob_spans(
    words: DataFrame,
    url_col: str = "url",
    pos_col: str = "pos",
    label_col: str = "iob",
) -> DataFrame:
    """Windowed decode over words(url, pos, iob in {B,I,O}, start, end)
    -> spans(url, start, end).

    grp      = running count of B's (session id);
    first_o  = first O position inside the group (ends the span — I's
               after it are orphans, exactly the scanner's behavior);
    span     = min(start)/max(end) over the kept contiguous rows.
    """
    w_doc = Window.partitionBy(url_col).orderBy(pos_col)
    grp = F.sum(
        F.when(F.col(label_col) == "B", 1).otherwise(0)
    ).over(w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    tagged = words.withColumn("_grp", grp)
    w_grp = Window.partitionBy(url_col, "_grp")
    first_o = F.min(
        F.when(F.col(label_col) == "O", F.col(pos_col))
    ).over(w_grp)
    kept = (
        tagged.withColumn("_first_o", first_o)
        .where(F.col("_grp") > 0)
        .where(F.col(label_col).isin("B", "I"))
        .where(
            F.col("_first_o").isNull() | (F.col(pos_col) < F.col("_first_o"))
        )
    )
    return (
        kept.groupBy(F.col(url_col).alias("url"), "_grp")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .select("url", "start", "end")
    )
