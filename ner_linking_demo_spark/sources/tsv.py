"""TSV sink/scan for reference-format interchange (S6/F12).

The reference's final artifact is a tab-separated mentions table whose
``code`` cell is the Python list repr of int codes
(`/root/reference/server/data/mentions.tsv:2`). This module reproduces
that format byte-for-byte at the export boundary; internally codes stay
``array<string>`` (SURVEY.md §1.2).

Unlike the reference (which overwrites its input TSV in place,
`mentions_normalization.py:177`), exports here always write a new file.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def codes_repr(codes: list[str]) -> str:
    """`[414915002, 414916001]` — int list repr when every code is
    numeric, else string reprs (the reference casts to int at
    `mentions_normalization.py:158-161`)."""
    if all(c.isdigit() for c in codes):
        return "[" + ", ".join(codes) + "]"
    return "[" + ", ".join(repr(c) for c in codes) + "]"


def linked_to_reference_tsv(linked_pdf: pd.DataFrame) -> str:
    """linked mentions (one doc) -> the reference mentions.tsv layout:
    header `label\tstart\tend\tspan\tcode`, sorted by (start, end, label)
    (`mentions_normalization.py:166-170`)."""
    df = linked_pdf.sort_values(["start", "end", "label"])
    lines = ["label\tstart\tend\tspan\tcode"]
    for r in df.itertuples():
        lines.append(
            f"{r.label}\t{r.start}\t{r.end}\t{r.span}\t{codes_repr(list(r.codes))}"
        )
    return "\n".join(lines) + "\n"


def export_mentions_tsv(linked: DataFrame, path: str) -> None:
    """Distributed TSV export: one part file per partition (url kept as a
    leading column since the corpus has many docs)."""
    formatted = linked.select(
        "url",
        "label",
        "start",
        "end",
        "span",
        F.concat(
            F.lit("["), F.concat_ws(", ", "codes"), F.lit("]")
        ).alias("code"),
    )
    formatted.write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).csv(path)


def read_mentions_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S2: read a mentions TSV back (stage-checkpoint scan shape)."""
    return spark.read.option("sep", "\t").option("header", True).csv(path)
