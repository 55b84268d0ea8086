"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: end-to-end KG pipeline throughput (docs/sec,
pages -> mentions -> linked codes -> canonicalized triples), the
BASELINE.md engine metric. Per-query wall seconds for representative
operators ride along in "queries".

Results are fully materialized via the noop sink (no driver collect
overhead, no disk write variance).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from ner_linking_demo_spark.plans import entry_queries as EQ
    from ner_linking_demo_spark.plans.pipeline import run_pipeline
    from ner_linking_demo_spark.session import get_spark

    spark = get_spark(
        app_name="nlds-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM and the python-worker pool so timings measure steady-state
    # throughput, not process/interpreter startup
    spark.range(10**6).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(cpus * 4).repartition(cpus).select(
        F.sum(_warm("id"))
    ).collect()

    timings: dict[str, float] = {}
    repeats = int(os.environ.get("NLDS_BENCH_REPEATS", "2"))

    def best_of(make_df) -> float:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            _materialize(make_df())
            best = min(best, time.time() - t0)
        return best

    # --- headline: full KG pipeline, lazy single plan, noop sink --------
    pages = EQ._docs_as_pages(spark, sf_dir)
    # default corpus scale-up: sf0.1's 5000 docs are overhead-bound at 32
    # cores; x8 (40k docs) measures steady-state pipeline throughput (the
    # BASELINE.md metric) while keeping the suite fast
    replicate = int(os.environ.get("NLDS_BENCH_REPLICATE", "8"))
    if replicate > 1:
        # deterministic corpus scale-up (distinct urls, same NER work per
        # copy) so the scaling bench is compute-bound, not overhead-bound;
        # crossJoin keeps the plan a single scan branch (a 40-way union
        # would serialize seconds of driver-side planning per run)
        from pyspark.sql import functions as FF

        reps = spark.range(replicate).toDF("rep")
        pages = pages.crossJoin(FF.broadcast(reps)).select(
            FF.concat("url", FF.lit("#r"), "rep").alias("url"), "text"
        )
    n_docs = pages.count()
    gaz = EQ._harness_gazetteer()
    kg_wall = best_of(
        lambda: run_pipeline(
            spark, pages, gaz, k=3, num_partitions=cpus * 2
        ).triples
    )
    timings["kg_pipeline_e2e"] = round(kg_wall, 3)

    # --- checkpointed (two-stage, resumable) plan: the resumability tax
    # as a number next to the fused plan ------------------------------
    ckpt_wall = None
    if os.environ.get("NLDS_BENCH_ONLY") != "kg":
        import shutil
        import tempfile

        def run_ckpt():
            d = tempfile.mkdtemp(prefix="nlds_bench_ckpt_")
            try:
                t0 = time.time()
                _materialize(
                    run_pipeline(
                        spark, pages, gaz, k=3, num_partitions=cpus * 2,
                        checkpoint_dir=d,
                    ).triples
                )
                return time.time() - t0
            finally:
                shutil.rmtree(d, ignore_errors=True)

        ckpt_wall = min(run_ckpt() for _ in range(repeats))
        timings["kg_pipeline_checkpointed"] = round(ckpt_wall, 3)

    # --- representative operator queries --------------------------------
    bench_queries = [] if os.environ.get("NLDS_BENCH_ONLY") == "kg" else [
        "a1_pricing_summary",
        "j1_revenue_by_nation",
        "w3_k_distinct_scan",
        "w8_sessionize",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "ann_bruteforce_topk",
        "ann_join_topk",
        "kg_detect_mentions_iob",
        "text_token_count",
        "text_quality_score",
        "kg_connected_components",
        "mm_extract_features",
    ]
    all_q = EQ.queries()
    for name in bench_queries:
        timings[name] = round(
            best_of(lambda: all_q[name](spark, sf_dir)), 3
        )

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / kg_wall, 2)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_dir,
                "cpus": cpus,
                "n_docs": n_docs,
                "kg_docs_per_sec": docs_per_sec,
                "kg_docs_per_sec_checkpointed": (
                    round(n_docs / ckpt_wall, 2) if ckpt_wall else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
