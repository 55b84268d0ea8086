"""S7: BRAT ``.ann`` annotation scans (reference
`/root/reference/server/ner/src/utils/ner/load_data.py:82-177` —
``process_brat_ner`` / ``process_brat_norm`` / ``process_de_ident_ner``).

Spark-first re-expression: ``spark.read.text`` over the ``.ann`` file
glob gives one distributed row per annotation line; parsing is native
column expressions (split/regexp — whole-stage codegen), discontinuous
locations explode into continuous rows exactly as the reference does
(`load_data.py:110-116,141-146`), and the Norm variant's T-line/#-line
pairing becomes an equi-join on (doc_id, annotation ordinal) — the
reference pairs by file-order adjacency, which the join subsumes (and
which no longer depends on line order, so it survives Spark's unordered
reads).

Scale posture: file-count parallelism from the text reader; no shuffle
except the Norm pairing join (both sides annotation-scale; AQE decides
broadcast)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_ann_lines(spark: SparkSession, path_glob: str) -> DataFrame:
    """.ann files -> (doc_id, line) rows; doc_id = basename segment
    before the FIRST dot, matching the reference's
    ``basename.split('.')[0]`` (`load_data.py:92,133,161`) — so
    'a.b.ann' yields 'a', not 'a.b'."""
    return (
        spark.read.text(path_glob)
        .withColumn(
            "doc_id",
            F.regexp_extract(F.input_file_name(), r"([^/.]+)[^/]*\.ann$", 1),
        )
        .where(F.trim("value") != "")
        .select("doc_id", F.col("value").alias("line"))
    )


def _parsed(lines: DataFrame) -> DataFrame:
    parts = F.split("line", "\t")
    meta = parts.getItem(1)
    return lines.select(
        "doc_id",
        parts.getItem(0).alias("tag"),
        F.regexp_extract(parts.getItem(0), r"^[T#](\d+)$", 1).alias("ordinal"),
        F.split(meta, " ").getItem(0).alias("ann_type"),
        # location = meta after the first space ("LABEL s e[;s e]*")
        F.expr(
            "substring(split(line, '\t')[1],"
            " length(split(split(line, '\t')[1], ' ')[0]) + 2)"
        ).alias("location"),
        parts.getItem(2).alias("text_ref"),
    )


def _explode_locations(t_rows: DataFrame) -> DataFrame:
    loc = F.explode(F.split("location", ";")).alias("loc")
    out = t_rows.select("doc_id", "ordinal", "text_ref", loc)
    pair = F.split("loc", " ")
    return out.select(
        "doc_id",
        "ordinal",
        "text_ref",
        pair.getItem(0).cast("int").alias("start"),
        pair.getItem(1).cast("int").alias("end"),
    )


def brat_ner_annotations(lines: DataFrame) -> DataFrame:
    """process_brat_ner: every line is a T annotation; discontinuous
    locations explode into continuous (doc_id, text_ref, start, end)."""
    t = _parsed(lines).where(F.col("tag").startswith("T"))
    return _explode_locations(t).select("doc_id", "text_ref", "start", "end")


def brat_norm_annotations(lines: DataFrame) -> DataFrame:
    """process_brat_norm: T/# line pairs; the #-line's third column is the
    code. Pairing by (doc_id, ordinal) join instead of line adjacency."""
    p = _parsed(lines)
    t = _explode_locations(p.where(F.col("tag").startswith("T")))
    codes = p.where(F.col("tag").startswith("#")).select(
        "doc_id", "ordinal", F.col("text_ref").alias("code")
    )
    return t.join(codes, ["doc_id", "ordinal"]).select(
        "doc_id", "code", "text_ref", "start", "end"
    )


def brat_deident_annotations(lines: DataFrame) -> DataFrame:
    """process_de_ident_ner: T lines only, location kept as the raw
    string (the downstream de-ident path parses it later)."""
    return (
        _parsed(lines)
        .where(F.col("tag").startswith("T"))
        .select("doc_id", "text_ref", F.col("ann_type").alias("type"), "location")
    )
