"""Per-query measurement harness for the optimization rounds (guide
§1.4: noop-sink isolation, §1.5: labelled jobs).

bench.py is FROZEN for driver measurement; this file holds the extra
instrumentation the optimization work needs:

- time any subset of the bench's queries (same thunks, same data, same
  noop materialization) without paying for the full interleaved suite;
- capture ``.explain("formatted")`` for a query into
  ``plans/r06/<query>_<suffix>.txt`` (the judge-checkable plan record);
- N repetitions per query, min/median reported (min is the
  least-throttled estimate on this down-clocking VM; bench.py's
  interleaved median stays the official protocol).

Usage:
    python bench_extra.py --sf /root/testdata/sf1.0 \
        --queries dedup_exact_substring,corpus_pipeline_e2e \
        --reps 3 [--explain-dir plans/r06 --suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import pandas as pd  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def build_benches(spark, sf_dir: str, cpus: int, names: set[str]):
    """name -> (thunk, df_factory|None). Mirrors bench.py's list; only
    entries in ``names`` are constructed (some have expensive setup)."""
    from pyspark.sql import functions as FS

    from ner_linking_demo_spark.plans import entry_queries as EQ
    from ner_linking_demo_spark.plans.pipeline import run_pipeline

    out: dict = {}

    def want(n):
        return not names or n in names

    pages = EQ._docs_as_pages(spark, sf_dir)
    replicate = int(os.environ.get("NLDS_BENCH_REPLICATE", "8"))
    if replicate > 1:
        reps = spark.range(replicate).toDF("rep")
        pages = pages.crossJoin(FS.broadcast(reps)).select(
            FS.concat("url", FS.lit("#r"), "rep").alias("url"), "text"
        )
    gaz = EQ._harness_gazetteer()

    if want("kg_pipeline_e2e"):
        out["kg_pipeline_e2e"] = (
            lambda: _materialize(
                run_pipeline(
                    spark, pages, gaz, k=3, num_partitions=cpus * 2
                ).triples
            ),
            lambda: run_pipeline(
                spark, pages, gaz, k=3, num_partitions=cpus * 2
            ).triples,
        )
    if want("kg_pipeline_checkpointed") or want(
        "kg_pipeline_checkpointed_coarse"
    ):
        import shutil
        import tempfile

        def run_ckpt(gran="fine"):
            d = tempfile.mkdtemp(prefix="nlds_bx_ckpt_")
            try:
                _materialize(
                    run_pipeline(
                        spark, pages, gaz, k=3, num_partitions=cpus * 2,
                        checkpoint_dir=d,
                        checkpoint_granularity=gran,
                    ).triples
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)

        out["kg_pipeline_checkpointed"] = (lambda: run_ckpt("fine"), None)
        out["kg_pipeline_checkpointed_coarse"] = (
            lambda: run_ckpt("coarse"),
            None,
        )

    all_q = EQ.queries()
    for qname in [
        "a1_pricing_summary",
        "j1_revenue_by_nation",
        "w3_k_distinct_scan",
        "w8_sessionize",
        "dedup_exact",
        "dedup_minhash_lsh",
        "ann_ivf_topk",
        "ann_join_topk",
        "kg_detect_mentions_iob",
        "text_analysis",
        "kg_connected_components",
        "mm_extract_features",
    ]:
        if want(qname):
            out[qname] = (
                lambda q=qname: _materialize(all_q[q](spark, sf_dir)),
                lambda q=qname: all_q[q](spark, sf_dir),
            )
    if want("ann_bruteforce_topk"):
        out["ann_bruteforce_topk"] = (
            lambda: _materialize(EQ.ann_bruteforce_topk(spark, sf_dir)),
            lambda: EQ.ann_bruteforce_topk(spark, sf_dir),
        )

    from ner_linking_demo_spark.operators import dedup as DD

    def _simhash_docs():
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("doc_id < 200")
            .select("doc_id", "text")
        )

    if want("dedup_simhash"):
        out["dedup_simhash"] = (
            lambda: _materialize(
                _simhash_docs().select(
                    "doc_id",
                    DD.simhash64(FS.col("text"), prefix_bits=32).alias(
                        "simhash"
                    ),
                )
            ),
            None,
        )
    if want("dedup_simhash_sig"):
        out["dedup_simhash_sig"] = (
            lambda: _materialize(
                DD.simhash_signatures_df(_simhash_docs(), prefix_bits=32)
            ),
            None,
        )

    from ner_linking_demo_spark.plans.corpus_pipeline import (
        run_corpus_pipeline,
    )

    corpus_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if want("corpus_pipeline_e2e"):
        out["corpus_pipeline_e2e"] = (
            lambda: _materialize(
                run_corpus_pipeline(
                    spark, corpus_docs, min_tokens=5,
                    jaccard_threshold=0.5, collect_stats=False,
                ).kept
            ),
            lambda: run_corpus_pipeline(
                spark, corpus_docs, min_tokens=5,
                jaccard_threshold=0.5, collect_stats=False,
            ).kept,
        )

    from ner_linking_demo_spark.functions.pii import scrub_pii
    from ner_linking_demo_spark.operators.decontamination import (
        collect_eval_ngrams,
        contamination_flag,
    )

    if want("decontam_flag_scan"):
        _eval_set = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("doc_id % 79 = 0")
            .limit(64)
            .select(
                FS.col("doc_id").alias("eval_id"),
                FS.concat_ws(
                    " ",
                    FS.slice(
                        FS.split(FS.trim(FS.col("text")), r"\s+"), 3, 10
                    ),
                ).alias("text"),
            )
        )
        _eval_grams = collect_eval_ngrams(_eval_set, n=8)
        out["decontam_flag_scan"] = (
            lambda: _materialize(
                corpus_docs.select(
                    "doc_id",
                    contamination_flag(
                        FS.col("text"), _eval_grams, n=8
                    ).alias("bad"),
                )
            ),
            None,
        )
    if want("pii_scrub"):
        out["pii_scrub"] = (
            lambda: _materialize(
                scrub_pii(
                    corpus_docs.select("doc_id", "text"), keep_counts=True
                )
            ),
            lambda: scrub_pii(
                corpus_docs.select("doc_id", "text"), keep_counts=True
            ),
        )

    _line_docs = corpus_docs.select(
        "doc_id",
        FS.concat_ws(
            "\n",
            FS.col("text"),
            FS.lit("please subscribe to our newsletter today"),
            FS.concat_ws(
                " ",
                FS.slice(
                    FS.split(FS.trim(FS.col("text")), r"\s+"), 1, 8
                ),
            ),
        ).alias("text"),
    )
    if want("dedup_lines"):
        out["dedup_lines"] = (
            lambda: _materialize(DD.dedup_lines(_line_docs)),
            lambda: DD.dedup_lines(_line_docs),
        )

    from ner_linking_demo_spark.operators.mixing import upsample

    if want("corpus_mix"):
        out["corpus_mix"] = (
            lambda: _materialize(upsample(corpus_docs, 2.5, seed="bench")),
            None,
        )

    import atexit
    import shutil as _sh
    import tempfile as _tf

    from ner_linking_demo_spark.operators.incremental_dedup import (
        SignatureStore,
        incremental_neardup,
        resignature_store,
    )

    if want("incremental_neardup_batch") or want("resignature_store"):
        _inc_root = _tf.mkdtemp(prefix="nlds_bx_incdd_")
        _inc_store = SignatureStore(spark, _inc_root)
        incremental_neardup(
            corpus_docs.select("doc_id", "text"), _inc_store, batch_id=0,
        )
        atexit.register(_sh.rmtree, _inc_root, ignore_errors=True)
        if want("incremental_neardup_batch"):
            _inc_delta = (
                corpus_docs.filter("doc_id < 500")
                .select(
                    (FS.col("doc_id") + 10_000_000).alias("doc_id"), "text"
                )
                .localCheckpoint(eager=True)
            )
            out["incremental_neardup_batch"] = (
                lambda: _materialize(
                    incremental_neardup(_inc_delta, _inc_store, batch_id=1)
                ),
                None,
            )
        if want("resignature_store"):
            _rsig_docs = corpus_docs.select("doc_id", "text")
            _rsig_old_root = _tf.mkdtemp(prefix="nlds_bx_rsig_old_")
            _sh.rmtree(_rsig_old_root)
            _sh.copytree(_inc_root, _rsig_old_root)
            _rsig_old = SignatureStore(spark, _rsig_old_root)
            _rsig_root = _tf.mkdtemp(prefix="nlds_bx_rsig_")
            atexit.register(_sh.rmtree, _rsig_old_root, ignore_errors=True)
            atexit.register(_sh.rmtree, _rsig_root, ignore_errors=True)

            def run_resignature():
                _sh.rmtree(_rsig_root, ignore_errors=True)
                resignature_store(
                    spark, _rsig_docs, _rsig_old, _rsig_root,
                    n_hashes=32, bands=8, shingle_size=3,
                )

            out["resignature_store"] = (run_resignature, None)

    if want("ann_ivf_search") or want("ann_ivf_sq8_search"):
        from ner_linking_demo_spark.operators.ivf import (
            ivf_index,
            ivf_index_sq8,
            ivf_search,
            ivf_search_sq8,
            train_centroids,
            train_sq8_bounds,
        )

        emb_tbl = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ivf_cent = train_centroids(emb_tbl, k_lists=32, sample_limit=20_000)
        ivf_idx = ivf_index(emb_tbl, ivf_cent).localCheckpoint(eager=True)
        ivf_queries = emb_tbl.limit(32).select(
            FS.col("vec_id").alias("q_id"), "embedding"
        ).localCheckpoint(eager=True)
        if want("ann_ivf_search"):
            out["ann_ivf_search"] = (
                lambda: _materialize(
                    ivf_search(ivf_queries, ivf_idx, ivf_cent, k=10, nprobe=4)
                ),
                lambda: ivf_search(
                    ivf_queries, ivf_idx, ivf_cent, k=10, nprobe=4
                ),
            )
        if want("ann_ivf_sq8_search"):
            ivf_vmin, ivf_step = train_sq8_bounds(
                emb_tbl, sample_limit=20_000
            )
            ivf_idx8 = ivf_index_sq8(
                emb_tbl, ivf_cent, ivf_vmin, ivf_step
            ).localCheckpoint(eager=True)
            out["ann_ivf_sq8_search"] = (
                lambda: _materialize(
                    ivf_search_sq8(
                        ivf_queries, ivf_idx8, ivf_cent, ivf_vmin,
                        ivf_step, k=10, nprobe=4,
                    )
                ),
                None,
            )

    if want("dedup_exact_substring"):
        from ner_linking_demo_spark.operators.substring_dedup import (
            exact_substring_pairs,
        )

        _ss_docs = corpus_docs.select("doc_id", "text").unionByName(
            corpus_docs.filter("doc_id < 500").select(
                (FS.col("doc_id") + 10_000_000).alias("doc_id"),
                FS.concat(
                    FS.array_join(
                        FS.slice(
                            FS.split(FS.trim(FS.col("text")), r"\s+"),
                            1,
                            60,
                        ),
                        " ",
                    ),
                    FS.lit(" zq bench tail pad pad pad"),
                ).alias("text"),
            )
        )
        out["dedup_exact_substring"] = (
            lambda: _materialize(
                exact_substring_pairs(
                    _ss_docs, min_tokens=24, n_gram=8, max_df=16
                )
            ),
            lambda: exact_substring_pairs(
                _ss_docs, min_tokens=24, n_gram=8, max_df=16
            ),
        )

    if want("pack_sequences"):
        from ner_linking_demo_spark.operators.packing import pack_sequences

        out["pack_sequences"] = (
            lambda: _materialize(
                pack_sequences(
                    corpus_docs, max_tokens=512, num_partitions=cpus * 2
                )
            ),
            lambda: pack_sequences(
                corpus_docs, max_tokens=512, num_partitions=cpus * 2
            ),
        )

    if want("pagerank_5iter"):
        from ner_linking_demo_spark.operators.pagerank import pagerank

        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter("l_orderkey < 12000")
            .select(
                FS.col("l_orderkey").alias("src"),
                FS.col("l_partkey").alias("dst"),
            )
            .localCheckpoint(eager=True)
        )
        out["pagerank_5iter"] = (
            lambda: _materialize(
                pagerank(li, max_iter=5, tol=0.0, num_partitions=cpus)
            ),
            lambda: pagerank(li, max_iter=5, tol=0.0, num_partitions=cpus),
        )

    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = {s for s in args.queries.split(",") if s}

    from ner_linking_demo_spark.session import get_spark

    spark = get_spark(
        app_name="nlds-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10**6).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(cpus * 4).repartition(cpus).select(
        F.sum(_warm("id"))
    ).collect()

    benches = build_benches(spark, args.sf, cpus, names)

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name, (_, dff) in benches.items():
            if dff is None:
                continue
            path = os.path.join(
                args.explain_dir, f"{name}_{args.suffix}.txt"
            )
            with open(path, "w") as fh:
                fh.write(plan_of(dff()))
            print(f"explain -> {path}")

    results: dict[str, list[float]] = {}
    order = list(benches.items())
    if not args.no_warm:
        for name, (thunk, _) in order:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            thunk()
    for _ in range(args.reps):
        for name, (thunk, _) in order:
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.time()
            thunk()
            results.setdefault(name, []).append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf": args.sf,
        "cpus": cpus,
        "reps": args.reps,
        "median": {
            n: round(statistics.median(s), 3) for n, s in results.items()
        },
        "min": {n: round(min(s), 3) for n, s in results.items()},
        "samples": {
            n: [round(x, 3) for x in s] for n, s in results.items()
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
