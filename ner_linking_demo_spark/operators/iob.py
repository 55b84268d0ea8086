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


def decode_iob_scan_discontinuous(
    labels: list[str], offsets: list[tuple[int, int]]
) -> list[list[tuple[int, int]]]:
    """Reference-shaped DISCONTINUOUS scanner
    (`post_process.py:493-559`, ``AnnExtractorDiscontinuous``): an
    annotation = the B-run plus every later I-run before the next B;
    each run is a (start, end) fragment. Returns one fragment list per
    annotation."""
    out: list[list[tuple[int, int]]] = []
    left, n = 0, len(labels)
    while left < n:
        if labels[left] != "B":
            left += 1
            continue
        right = left + 1
        while right < n and labels[right] == "I":
            right += 1
        frags = [(offsets[left][0], offsets[right - 1][1])]
        inter = right
        while inter < n and labels[inter] != "B":
            if labels[inter] == "I":
                right = inter + 1
                while right < n and labels[right] == "I":
                    right += 1
                frags.append((offsets[inter][0], offsets[right - 1][1]))
                inter = right
            else:
                inter += 1
        left = inter
        out.append(frags)
    return out


def decode_iob_spans_discontinuous(
    words: DataFrame,
    url_col: str = "url",
    pos_col: str = "pos",
    label_col: str = "iob",
) -> DataFrame:
    """Windowed DataFrame form of the discontinuous decode — a
    gaps-and-islands composition:

    grp    = running count of B's (annotation session, as in
             :func:`decode_iob_spans`);
    island = pos - row_number within (url, grp) over the kept B/I rows —
             constant exactly on maximal consecutive runs (O rows break
             the consecutiveness, so each I-run is its own island);
    output = per (url, grp): fragments ordered by position, rendered as
             the reference's ``"s1 e1;s2 e2"`` location string.

    Scanner parity is tested on random tag sequences
    (tests/test_iob.py)."""
    w_doc = Window.partitionBy(url_col).orderBy(pos_col)
    grp = F.sum(
        F.when(F.col(label_col) == "B", 1).otherwise(0)
    ).over(w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    kept = (
        words.withColumn("_grp", grp)
        .where(F.col("_grp") > 0)
        .where(F.col(label_col).isin("B", "I"))
    )
    w_grp = Window.partitionBy(url_col, "_grp").orderBy(pos_col)
    kept = kept.withColumn(
        "_island", F.col(pos_col) - F.row_number().over(w_grp)
    )
    frags = kept.groupBy(
        F.col(url_col).alias("url"), "_grp", "_island"
    ).agg(
        F.min("start").alias("fs"),
        F.max("end").alias("fe"),
        F.min(pos_col).alias("fpos"),
    )
    return (
        frags.groupBy("url", "_grp")
        .agg(
            F.concat_ws(
                ";",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("fpos", "fs", "fe"))),
                    lambda s: F.concat_ws(
                        " ", s["fs"].cast("string"), s["fe"].cast("string")
                    ),
                ),
            ).alias("location"),
            F.min("fs").alias("start"),
            F.max("fe").alias("end"),
        )
        .select("url", "location", "start", "end")
    )


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
