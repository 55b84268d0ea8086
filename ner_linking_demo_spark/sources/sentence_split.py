"""S9: sentence-split (SS) scan (reference
`/root/reference/server/ner/src/utils/ner/load_data.py:28-43`,
``load_ss_files``): one file per document, each line a
``start<TAB>end`` character pair. The demo path passes ``ss_dict=None``
(SURVEY S9), but the SS-aware fragment packing exists in the reference
(`pre_process.py:814-877`), so the scan + packing are covered.

Spark shape: distributed text read, native split/cast, one groupBy per
doc collecting the ordered pair array — a dimension-scale table that
joins (broadcast) onto pages before the NER UDF."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_sentence_splits(spark: SparkSession, path_glob: str) -> DataFrame:
    """.txt SS files -> (doc_id, ss array<struct<start int, end int>>),
    pairs ordered by start (reference keeps file line order; lines are
    emitted in ascending start order by the upstream splitter)."""
    parts = F.split(F.trim("value"), "\t")
    return (
        spark.read.text(path_glob)
        .withColumn(
            "doc_id", F.regexp_extract(F.input_file_name(), r"([^/]+)\.[^./]+$", 1)
        )
        .where(F.trim("value") != "")
        .select(
            "doc_id",
            F.struct(
                parts.getItem(0).cast("int").alias("start"),
                parts.getItem(1).cast("int").alias("end"),
            ).alias("pair"),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pair")).alias("ss"))
    )
