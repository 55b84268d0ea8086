"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: end-to-end KG pipeline throughput (docs/sec,
pages -> mentions -> linked codes -> canonicalized triples), the
BASELINE.md engine metric. Per-query wall seconds for representative
operators ride along in "queries".

Measurement protocol (round-2 verdict item 6): INTERLEAVED rounds —
every benchmark runs once per round, rounds repeat NLDS_BENCH_REPEATS
times (default 3), and the reported number is the per-benchmark MEDIAN.
This sandbox VM down-clocks under sustained load with run-to-run swings
up to 2x (BENCH/BASELINE.md); back-to-back repeats of one query share
the same throttle state, so only interleaving + median makes cross-round
comparisons falsifiable. Per-query relative spread (max-min)/median is
published in "queries_spread".

Results are fully materialized via the noop sink (no driver collect
overhead, no disk write variance).
"""

from __future__ import annotations

import json
import os
import statistics
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

    # pre-flight idle probe (round-4 verdict item 1): refuse to start
    # timing while the hypervisor is throttling the box; if the window
    # never clears within the wait budget, proceed but stamp the probe
    # verdict into the output so the recording is self-describing.
    # NLDS_IDLE_PROBE=0 skips (unit tests / sub-benchmarks that are
    # probed by their caller).
    if os.environ.get("NLDS_IDLE_PROBE", "1") != "0":
        from tools.idle_probe import probe as _idle_probe

        idle = _idle_probe(
            max_wait_s=float(
                os.environ.get("NLDS_IDLE_PROBE_MAX_WAIT", "240")
            )
        )
    else:
        idle = {"ok": None, "ratio": None, "skipped": True}

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

    rounds = int(os.environ.get("NLDS_BENCH_REPEATS", "3"))

    # --- build the benchmark list (name -> thunk that materializes) -----
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
        reps = spark.range(replicate).toDF("rep")
        pages = pages.crossJoin(F.broadcast(reps)).select(
            F.concat("url", F.lit("#r"), "rep").alias("url"), "text"
        )
    n_docs = pages.count()
    gaz = EQ._harness_gazetteer()

    benches: list[tuple[str, object]] = [
        (
            "kg_pipeline_e2e",
            lambda: _materialize(
                run_pipeline(
                    spark, pages, gaz, k=3, num_partitions=cpus * 2
                ).triples
            ),
        )
    ]

    only_kg = os.environ.get("NLDS_BENCH_ONLY") == "kg"
    n_corpus_docs = 0
    if not only_kg:
        import shutil
        import tempfile

        def run_ckpt():
            d = tempfile.mkdtemp(prefix="nlds_bench_ckpt_")
            try:
                _materialize(
                    run_pipeline(
                        spark, pages, gaz, k=3, num_partitions=cpus * 2,
                        checkpoint_dir=d,
                    ).triples
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)

        benches.append(("kg_pipeline_checkpointed", run_ckpt))

        def run_ckpt_coarse():
            d = tempfile.mkdtemp(prefix="nlds_bench_ckptc_")
            try:
                _materialize(
                    run_pipeline(
                        spark, pages, gaz, k=3, num_partitions=cpus * 2,
                        checkpoint_dir=d,
                        checkpoint_granularity="coarse",
                    ).triples
                )
            finally:
                shutil.rmtree(d, ignore_errors=True)

        benches.append(
            ("kg_pipeline_checkpointed_coarse", run_ckpt_coarse)
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
            benches.append(
                (
                    qname,
                    lambda q=qname: _materialize(all_q[q](spark, sf_dir)),
                )
            )

        # brute-force ANN baseline (rotated out of the driver window in
        # round 4 but still the exactness/throughput reference point)
        benches.append(
            (
                "ann_bruteforce_topk",
                lambda: _materialize(
                    EQ.ann_bruteforce_topk(spark, sf_dir)
                ),
            )
        )

        # both SimHash forms, measured side by side (round-2 verdict:
        # decide the benched default from a noise-controlled comparison;
        # the expression-form registry entry was retired in round 3, so
        # both run as direct operator thunks here)
        from pyspark.sql import functions as FS

        from ner_linking_demo_spark.operators import dedup as DD

        def _simhash_docs():
            return (
                spark.read.parquet(f"{sf_dir}/documents.parquet")
                .filter("doc_id < 200")
                .select("doc_id", "text")
            )

        benches.append(
            (
                "dedup_simhash",
                lambda: _materialize(
                    _simhash_docs().select(
                        "doc_id",
                        DD.simhash64(FS.col("text"), prefix_bits=32).alias(
                            "simhash"
                        ),
                    )
                ),
            )
        )
        benches.append(
            (
                "dedup_simhash_sig",
                lambda: _materialize(
                    DD.simhash_signatures_df(_simhash_docs(), prefix_bits=32)
                ),
            )
        )

        # corpus preprocessing composition (annotate -> filter -> exact
        # dedup -> LSH near-dup cluster representatives), the
        # training-data-pipeline headline; stats off = pure throughput
        from ner_linking_demo_spark.plans.corpus_pipeline import (
            run_corpus_pipeline,
        )

        corpus_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_corpus_docs = corpus_docs.count()
        benches.append(
            (
                "corpus_pipeline_e2e",
                lambda: _materialize(
                    run_corpus_pipeline(
                        spark, corpus_docs, min_tokens=5,
                        jaccard_threshold=0.5, collect_stats=False,
                    ).kept
                ),
            )
        )

        # decontamination scan-form flag + PII scrub (round-4 session
        # 4): the two curation stages measured standalone over the full
        # documents table — the per-doc cost each adds to a corpus scan.
        # The eval set = 64 ten-token slices of corpus docs (realistic:
        # grams DO occur in the corpus).
        from ner_linking_demo_spark.functions.pii import scrub_pii
        from ner_linking_demo_spark.operators.decontamination import (
            collect_eval_ngrams,
            contamination_flag,
        )

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
        benches.append(
            (
                "decontam_flag_scan",
                lambda: _materialize(
                    corpus_docs.select(
                        "doc_id",
                        contamination_flag(
                            FS.col("text"), _eval_grams, n=8
                        ).alias("bad"),
                    )
                ),
            )
        )
        benches.append(
            (
                "pii_scrub",
                lambda: _materialize(
                    scrub_pii(
                        corpus_docs.select("doc_id", "text"),
                        keep_counts=True,
                    )
                ),
            )
        )

        # line-level dedup (CCNet): synthesize 3-line docs from the
        # corpus (own prefix + shared boilerplate + rotating prefix)
        # so the keeper election sees a genuinely hot line
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
        benches.append(
            (
                "dedup_lines",
                lambda: _materialize(DD.dedup_lines(_line_docs)),
            )
        )

        # deterministic corpus mixing (round-4 session 4): weight-2.5
        # upsample of the full documents table — 2 full copies + a
        # 0.5-rate third, one scan, zero exchange
        from ner_linking_demo_spark.operators.mixing import upsample

        benches.append(
            (
                "corpus_mix",
                lambda: _materialize(
                    upsample(corpus_docs, 2.5, seed="bench")
                ),
            )
        )

        # incremental near-dup per-batch latency (round-4): the store is
        # built once in setup (history = the full documents table); the
        # benchmark measures ONE delta batch (500 docs = exact copies of
        # history docs) against it — the O(delta) production path.
        # A FIXED batch_id keeps per-round work identical: the first
        # round publishes, later rounds are the replay recompute (same
        # match computation via name-based self-exclusion, no append).
        import shutil as _sh
        import tempfile as _tf

        from ner_linking_demo_spark.operators.incremental_dedup import (
            SignatureStore,
            incremental_neardup,
        )

        _inc_root = _tf.mkdtemp(prefix="nlds_bench_incdd_")
        _inc_store = SignatureStore(spark, _inc_root)
        incremental_neardup(
            corpus_docs.select("doc_id", "text"), _inc_store, batch_id=0,
        )
        _inc_delta = (
            corpus_docs.filter("doc_id < 500")
            .select(
                (FS.col("doc_id") + 10_000_000).alias("doc_id"), "text"
            )
            .localCheckpoint(eager=True)
        )

        def run_inc_batch():
            _materialize(
                incremental_neardup(_inc_delta, _inc_store, batch_id=1)
            )

        benches.append(("incremental_neardup_batch", run_inc_batch))
        import atexit

        atexit.register(_sh.rmtree, _inc_root, ignore_errors=True)

        # IVF ANN search (round-4): index built once in setup (the
        # at-rest artifact), the benchmark measures the per-query-batch
        # search path — 32 queries x nprobe=4 of 32 lists
        from ner_linking_demo_spark.operators.ivf import (
            ivf_index,
            ivf_search,
            train_centroids,
        )

        emb_tbl = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ivf_cent = train_centroids(emb_tbl, k_lists=32, sample_limit=20_000)
        ivf_idx = ivf_index(emb_tbl, ivf_cent).localCheckpoint(eager=True)
        ivf_queries = emb_tbl.limit(32).select(
            FS.col("vec_id").alias("q_id"), "embedding"
        ).localCheckpoint(eager=True)
        benches.append(
            (
                "ann_ivf_search",
                lambda: _materialize(
                    ivf_search(
                        ivf_queries, ivf_idx, ivf_cent, k=10, nprobe=4
                    )
                ),
            )
        )

        # SQ8-quantized IVF search (round 5): same query batch over the
        # int8-coded index — asymmetric-distance scoring, pure codegen
        from ner_linking_demo_spark.operators.ivf import (
            ivf_index_sq8,
            ivf_search_sq8,
            train_sq8_bounds,
        )

        ivf_vmin, ivf_step = train_sq8_bounds(emb_tbl, sample_limit=20_000)
        ivf_idx8 = ivf_index_sq8(
            emb_tbl, ivf_cent, ivf_vmin, ivf_step
        ).localCheckpoint(eager=True)
        benches.append(
            (
                "ann_ivf_sq8_search",
                lambda: _materialize(
                    ivf_search_sq8(
                        ivf_queries, ivf_idx8, ivf_cent, ivf_vmin,
                        ivf_step, k=10, nprobe=4,
                    )
                ),
            )
        )

        # exact substring dedup (round 5, Lee et al. family): full
        # documents table + 500 planted partial copies — gram explode,
        # df-pruned anchor join, gaps-and-islands extents
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
        benches.append(
            (
                "dedup_exact_substring",
                lambda: _materialize(
                    exact_substring_pairs(
                        _ss_docs, min_tokens=24, n_gram=8, max_df=16
                    )
                ),
            )
        )

        # greedy sequence packing over the full documents table (bounded
        # open-bin first-fit; round-4 driver entry)
        from ner_linking_demo_spark.operators.packing import pack_sequences

        benches.append(
            (
                "pack_sequences",
                lambda: _materialize(
                    pack_sequences(
                        corpus_docs, max_tokens=512,
                        num_partitions=cpus * 2,
                    )
                ),
            )
        )

        # signature-store migration (round-4 session 2): re-sign a
        # full-table history store (one batch, n_docs docs) from 16 to
        # 32 hashes — the job a pinned-param change costs in production.
        # A SEPARATE frozen store: the incremental bench appends a delta
        # batch (ids outside the docs table) to _inc_store, and
        # migration correctly refuses a store holding ids it has no text
        # for. Each rep wipes its output root first (publish is
        # exactly-once and refuses an existing batch dir).
        from ner_linking_demo_spark.operators.incremental_dedup import (
            resignature_store,
        )

        _rsig_docs = corpus_docs.select("doc_id", "text")
        # at this point _inc_root holds exactly the frozen full-table
        # batch 0 (the delta batch is appended only when benches RUN),
        # so a directory copy gives the identical store for free instead
        # of a second full LSH pass
        _rsig_old_root = _tf.mkdtemp(prefix="nlds_bench_rsig_old_")
        _sh.rmtree(_rsig_old_root)
        _sh.copytree(_inc_root, _rsig_old_root)
        _rsig_old = SignatureStore(spark, _rsig_old_root)
        _rsig_root = _tf.mkdtemp(prefix="nlds_bench_rsig_")
        atexit.register(_sh.rmtree, _rsig_old_root, ignore_errors=True)
        atexit.register(_sh.rmtree, _rsig_root, ignore_errors=True)

        def run_resignature():
            _sh.rmtree(_rsig_root, ignore_errors=True)
            resignature_store(
                spark, _rsig_docs, _rsig_old, _rsig_root,
                n_hashes=32, bands=8, shingle_size=3,
            )

        benches.append(("resignature_store", run_resignature))

        # entity PageRank (round-4 session 3): power iteration over a
        # ~50k-edge bipartite graph from lineitem (order -> part) — the
        # KG entity-importance pass; fixed 5 iterations (tol=0 disables
        # early stop AND the per-round delta join) so per-round work is
        # identical
        li = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter("l_orderkey < 12000")
            .select(
                FS.col("l_orderkey").alias("src"),
                FS.col("l_partkey").alias("dst"),
            )
            .localCheckpoint(eager=True)
        )
        from ner_linking_demo_spark.operators.pagerank import pagerank

        benches.append(
            (
                "pagerank_5iter",
                lambda: _materialize(
                    pagerank(li, max_iter=5, tol=0.0, num_partitions=cpus)
                ),
            )
        )

    # --- interleaved rounds, median per benchmark ------------------------
    # steady-state warmup of the KG hot path: the first fused-UDF run of
    # a session pays one-time costs (python worker pool growth to the
    # full task width, UDF/codegen JIT, AQE statistics) that are setup,
    # not throughput — round-5 measurements showed it as a consistent
    # ~2x relative spread on kg_pipeline_e2e. One untimed run makes the
    # interleaved medians measure what the docstring promises.
    benches[0][1]()
    samples: dict[str, list[float]] = {name: [] for name, _ in benches}
    for _ in range(rounds):
        for name, thunk in benches:
            t0 = time.time()
            thunk()
            samples[name].append(time.time() - t0)

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    spread = {
        n: round((max(s) - min(s)) / max(statistics.median(s), 1e-9), 2)
        for n, s in samples.items()
    }

    kg_wall = timings["kg_pipeline_e2e"]
    ckpt_wall = timings.get("kg_pipeline_checkpointed")
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_spread": spread,
                "protocol": f"interleaved median of {rounds}, kg warmup",
                "idle_probe": idle,
                "sf": sf_dir,
                "cpus": cpus,
                "n_docs": n_docs,
                "kg_docs_per_sec": round(n_docs / kg_wall, 2),
                "corpus_docs_per_sec": (
                    round(
                        n_corpus_docs / timings["corpus_pipeline_e2e"], 2
                    )
                    if "corpus_pipeline_e2e" in timings
                    else None
                ),
                "kg_docs_per_sec_checkpointed": (
                    round(n_docs / ckpt_wall, 2) if ckpt_wall else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
