"""Checkpoint/lineage runtime: kill/rerun resumes without recomputation
(north_rule resumability; SURVEY.md §5 pyramid (d))."""

from __future__ import annotations

import pandas as pd

from ner_linking_demo_spark.plans.catalog import CheckpointCatalog
from ner_linking_demo_spark.plans.pipeline import run_pipeline
from ner_linking_demo_spark.sources.fixtures import pages_to_spark


def test_stage_resume_skips_compute(spark, tmp_path):
    cat = CheckpointCatalog(spark, str(tmp_path / "cat"))
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(5).toDF("id")

    a = cat.stage("t1", "sig-A", compute)
    assert calls["n"] == 1 and a.count() == 5
    b = cat.stage("t1", "sig-A", compute)  # resumed, not recomputed
    assert calls["n"] == 1 and b.count() == 5
    c = cat.stage("t1", "sig-B", compute)  # new input -> recompute
    assert calls["n"] == 2 and c.count() == 5

    stages = cat.lineage()
    assert any(s.get("resumed") for s in stages)
    written = [s for s in stages if not s.get("resumed")]
    assert all(s["rows_out"] == 5 for s in written)
    assert all(isinstance(s.get("partition_rows"), dict) for s in written)


def test_atomic_publish_survives_partial_write(spark, tmp_path):
    cat = CheckpointCatalog(spark, str(tmp_path / "cat2"))
    cat.write(spark.range(3).toDF("id"), "t")
    # simulate a killed writer: a dangling snapshot dir without pointer flip
    import os

    os.makedirs(str(tmp_path / "cat2/t/snap-99999"), exist_ok=True)
    assert cat.read("t").count() == 3  # reader unaffected


def test_pipeline_resume_end_to_end(spark, golden_pages, golden_gazetteer, tmp_path):
    pages = pages_to_spark(spark, golden_pages.head(10))
    ckpt = str(tmp_path / "pipe")
    r1 = run_pipeline(
        spark, pages, golden_gazetteer, k=3, checkpoint_dir=ckpt,
        input_sig="pages-v1",
    )
    t1 = r1.triples.toPandas()

    # rerun: every stage must resume from snapshots
    r2 = run_pipeline(
        spark, pages, golden_gazetteer, k=3, checkpoint_dir=ckpt,
        input_sig="pages-v1",
    )
    t2 = r2.triples.toPandas()
    cat = CheckpointCatalog(spark, ckpt)
    resumed = [s["table"] for s in cat.lineage() if s.get("resumed")]
    assert {"mentions", "linked", "triples", "edges"} <= set(resumed)

    key = ["subj", "pred", "code", "start", "end"]
    pd.testing.assert_frame_equal(
        t1.sort_values(key).reset_index(drop=True),
        t2.sort_values(key).reset_index(drop=True),
    )
