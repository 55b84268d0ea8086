"""Physical-plan property tests (the .explain contract the 100 TB posture
depends on). Full audit: tools/explain_audit.py."""

from __future__ import annotations

import re

from ner_linking_demo_spark.plans.pipeline import run_pipeline
from ner_linking_demo_spark.sources.fixtures import pages_to_spark


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"\(\d+\) {name}", plan))


def test_throughput_plan_shape(spark, golden_pages, golden_gazetteer):
    """The fused pages->linked plan must be Scan -> Project -> ONE Exchange
    -> ONE python stage; triples adds only a broadcast join."""
    pages = pages_to_spark(spark, golden_pages.head(5))
    res = run_pipeline(spark, pages, golden_gazetteer, k=3)
    p = _plan(res.linked)
    assert _nodes(p, "Exchange") == 1, p
    assert _nodes(p, "MapInPandas") + _nodes(p, "PythonMapInArrow") == 1, p
    pt = _plan(res.triples)
    assert "BroadcastHashJoin" in pt, pt
    assert _nodes(pt, "Exchange") + _nodes(pt, "BroadcastExchange") <= 2, pt


def test_checkpointed_plan_prunes_pages_columns(
    spark, golden_pages, golden_gazetteer
):
    """The NER stage must read only (url, text) from pages — html/warc_ts
    pruned before the UDF."""
    from ner_linking_demo_spark.operators.ner import detect_mentions

    pages = pages_to_spark(spark, golden_pages.head(5))
    p = _plan(detect_mentions(pages, golden_gazetteer))
    udf_input = p.split("MapInPandas")[1][:300]
    assert "html" not in udf_input and "warc_ts" not in udf_input


def test_lsh_pair_join_never_shuffles_text(spark):
    """Round-1 verdict scale-killer: the MinHash-LSH banding explode, the
    bucket-size aggregation, and the bucket self-join must carry only
    (id, band, bucket) — never the document text. Text may appear solely
    in the scan->UDF signature stage and the final by-id shingle joins."""
    from ner_linking_demo_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(i, f"w{i} common tokens here for doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(DD.minhash_lsh_pairs(docs))
    # every Exchange block: its output schema must not contain text unless
    # it is one of the two id-keyed shingle-set joins (sh_a / sh_b)
    for block in re.split(r"\(\d+\) ", plan):
        if block.startswith("Exchange") and "text#" in block:
            raise AssertionError(f"text rides a shuffle:\n{block}")


def test_no_shuffle_plan_when_layout_trusted(
    spark, golden_pages, golden_gazetteer
):
    """num_partitions=0 => trust the input layout: ZERO exchanges before
    the fused UDF (the storage-aligned 100 TB run skips the corpus
    re-shuffle entirely)."""
    from ner_linking_demo_spark.functions.embedder import HashEmbedder
    from ner_linking_demo_spark.operators.linking import (
        build_indexes,
        detect_and_link,
    )

    pages = pages_to_spark(spark, golden_pages.head(5))
    linked = detect_and_link(
        pages,
        golden_gazetteer,
        build_indexes(golden_gazetteer, k=3),
        k=3,
        embedder=HashEmbedder(),
        num_partitions=0,
    )
    p = _plan(linked)
    assert _nodes(p, "Exchange") == 0, p
    # and the result is identical to the shuffled plan
    shuffled = detect_and_link(
        pages, golden_gazetteer, build_indexes(golden_gazetteer, k=3), k=3,
        embedder=HashEmbedder(), num_partitions=4,
    )
    a = linked.toPandas().sort_values(["url", "start", "label"]).reset_index(drop=True)
    b = shuffled.toPandas().sort_values(["url", "start", "label"]).reset_index(drop=True)
    assert a[["url", "start", "end", "label", "span"]].equals(
        b[["url", "start", "end", "label", "span"]]
    )
