"""Similarity search: brute-force exactness vs numpy; LSH recall vs the
brute-force baseline."""

from __future__ import annotations

import numpy as np
import pytest

from ner_linking_demo_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((300, 16)).astype(np.float32)
    rows = [(i, int(i % 3), [float(x) for x in mat[i]]) for i in range(300)]
    return (
        spark.createDataFrame(rows, ["vec_id", "label", "embedding"]),
        mat,
    )


def test_brute_force_matches_numpy(spark, vectors):
    df, mat = vectors
    q = mat[0]
    got = SIM.brute_force_topk(df, q, k=10).toPandas()
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((np.arange(len(sims)), -sims))[:10]
    assert list(got["vec_id"]) == [int(i) for i in order]
    assert np.allclose(got["cosine"], sims[order], atol=1e-6)


def test_lsh_recall(spark, vectors):
    df, mat = vectors
    planes = SIM.hyperplanes(dim=16, n_planes=8)
    indexed = SIM.lsh_index(df, planes).cache()
    recalls = []
    for qi in range(5):
        q = mat[qi]
        exact = set(
            SIM.brute_force_topk(df, q, k=10).toPandas()["vec_id"]
        )
        approx = set(
            SIM.lsh_topk(indexed, q, planes, k=10, probe_bits=2).toPandas()[
                "vec_id"
            ]
        )
        recalls.append(len(exact & approx) / 10)
    assert np.mean(recalls) >= 0.5  # multi-probe recall on random data
    # the query's own vector is always retrieved (bucket identity)
    own = SIM.lsh_topk(indexed, mat[3], planes, k=10, probe_bits=1).toPandas()
    assert 3 in set(own["vec_id"])


def test_bucket_pruning(spark, vectors):
    df, mat = vectors
    planes = SIM.hyperplanes(dim=16, n_planes=8)
    indexed = SIM.lsh_index(df, planes)
    n_buckets = indexed.select("bucket").distinct().count()
    assert n_buckets > 10  # buckets actually partition the space


def test_ann_join_equals_per_query_lsh(spark, vectors):
    """Batch ANN join == the single-query LSH probe run per query, and
    recall vs brute force is monotone in probe_bits."""
    import pyspark.sql.functions as F

    df, mat = vectors
    planes = SIM.hyperplanes(dim=16, n_planes=8)
    indexed = SIM.lsh_index(df, planes).cache()
    queries = df.filter("vec_id < 5").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    prev_recall = -1.0
    for probe_bits in (0, 1, 2):
        batch = SIM.ann_join(
            queries, df, planes, k=10, probe_bits=probe_bits
        ).toPandas()
        recalls = []
        for qi in range(5):
            got = set(batch[batch["q_id"] == qi]["vec_id"])
            single = set(
                SIM.lsh_topk(
                    indexed, mat[qi], planes, k=10, probe_bits=probe_bits
                ).toPandas()["vec_id"]
            )
            assert got == single, (probe_bits, qi)
            exact = set(
                SIM.brute_force_topk(df, mat[qi], k=10).toPandas()["vec_id"]
            )
            recalls.append(len(got & exact) / 10)
        r = sum(recalls) / len(recalls)
        assert r >= prev_recall  # multi-probe only adds candidates
        prev_recall = r
    assert prev_recall >= 0.5  # probe_bits=2 on random data


def test_bucket_udf_parity_with_expression(spark, vectors):
    """Arrow-batched matmul buckets == expression-form buckets on real
    float data (sign semantics identical away from exact-zero dots)."""
    df, _ = vectors
    planes = SIM.hyperplanes(dim=16, n_planes=8)
    a = SIM.lsh_index(df, planes, method="expr").select("vec_id", "bucket")
    b = SIM.lsh_index(df, planes, method="pandas").select("vec_id", "bucket")
    pa = dict(zip(*map(list, zip(*a.collect()))))
    pb = dict(zip(*map(list, zip(*b.collect()))))
    assert pa == pb


def test_bucketed_index_zero_corpus_shuffle(spark, vectors, tmp_path):
    """write_bucketed_index + index_prepared: same results as the inline
    path, and the PHYSICAL plan shows no Exchange on the corpus side —
    the scan's bucket clustering feeds the join directly. The only
    exchanges left are the query side and the ranking window."""
    import pyspark.sql.functions as F

    df, _ = vectors
    planes = SIM.hyperplanes(dim=16, n_planes=8)
    queries = df.filter("vec_id < 5").select(
        F.col("vec_id").alias("q_id"), "embedding"
    )

    SIM.write_bucketed_index(
        df, planes, "ann_idx_test", n_buckets=8,
        path=str(tmp_path / "ann_idx"),
    )
    try:
        corpus = spark.table("ann_idx_test")
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = SIM.ann_join(
                queries, corpus, planes, k=10, probe_bits=1,
                index_prepared=True,
            )
            import re

            plan = out._sc._jvm.PythonSQLUtils.explainString(
                out._jdf.queryExecution(), "formatted"
            )
            # exactly two Exchange nodes: query side + ranking window;
            # the corpus scan feeds the join with no Exchange above it
            assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2, plan
            assert re.search(r"Sort[\s\S]{0,200}?Scan parquet[^\n]*ann_idx_test", plan), plan
            got = out.toPandas()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

        ref = SIM.ann_join(
            queries, df, planes, k=10, probe_bits=1
        ).toPandas()
        key = ["q_id", "rank"]
        import pandas as pd

        pd.testing.assert_frame_equal(
            got.sort_values(key).reset_index(drop=True)[
                ["q_id", "vec_id", "rank"]
            ],
            ref.sort_values(key).reset_index(drop=True)[
                ["q_id", "vec_id", "rank"]
            ],
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_idx_test")


def test_bucket_and_sketch_udfs_null_safe(spark):
    """NULL embeddings must behave like the expression forms (bucket 0 /
    all-zero sketch words), not crash np.stack inside the Arrow UDF —
    callers that ran to completion on imperfect input before the
    auto-switch must still complete after it."""
    import numpy as np

    from pyspark.sql import functions as F

    from ner_linking_demo_spark.operators.incremental_dedup import (
        _sign_sketch,
    )
    from ner_linking_demo_spark.operators.similarity import (
        hyperplanes,
        lsh_bucket_expr,
        lsh_bucket_udf,
    )

    planes = hyperplanes(dim=8, n_planes=6, seed=2)
    sketch_planes = np.random.default_rng(3).standard_normal((126, 8))
    rows = [
        (1, [0.5, -1.0, 2.0, 0.25, -0.75, 1.5, -2.0, 0.1]),
        (2, None),
        (3, [1.0] * 8),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    emb = F.col("embedding")
    got = df.select(
        "vec_id",
        lsh_bucket_expr(emb, planes).alias("b_expr"),
        lsh_bucket_udf(planes)(emb).alias("b_udf"),
        _sign_sketch(emb, sketch_planes, method="expr").alias("s_expr"),
        _sign_sketch(emb, sketch_planes, method="pandas").alias("s_udf"),
    ).collect()
    for r in got:
        assert r["b_expr"] == r["b_udf"], r["vec_id"]
        assert r["s_expr"] == r["s_udf"], r["vec_id"]
    null_row = [r for r in got if r["vec_id"] == 2][0]
    assert null_row["b_udf"] == 0
    assert list(null_row["s_udf"]) == [0, 0]
