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
    # simulate a partially-copied snapshot dir (non-atomic rename store):
    # no _META.json => invisible to readers, even at a higher seq
    import os

    os.makedirs(str(tmp_path / "cat2/t/snap-99999"), exist_ok=True)
    assert cat.read("t").count() == 3  # reader unaffected
    # killed writer leaves staging garbage only; next write overwrites it
    os.makedirs(str(tmp_path / "cat2/_staging/t/snap-00001"), exist_ok=True)
    cat.write(spark.range(4).toDF("id"), "t")
    assert cat.read("t").count() == 4


def test_hadoop_fs_backend_roundtrip(spark, tmp_path):
    """file:// routes the control plane through the Hadoop FileSystem
    API — the same code path an hdfs:// / s3a:// base_dir takes on a
    real cluster (publish rename, _META marker, per-row lineage files)."""
    cat = CheckpointCatalog(spark, f"file://{tmp_path}/cath")
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(7).toDF("id")

    a = cat.stage("t", "sig-A", compute)
    assert calls["n"] == 1 and a.count() == 7
    b = cat.stage("t", "sig-A", compute)  # resume through HadoopFS
    assert calls["n"] == 1 and b.count() == 7

    rows = cat.lineage()
    written = [s for s in rows if not s.get("resumed")]
    assert written and written[0]["rows_out"] == 7
    assert any(s.get("resumed") for s in rows)


def test_expire_snapshots_and_compact(spark, tmp_path):
    import os

    cat = CheckpointCatalog(spark, str(tmp_path / "catm"))
    cat.write(spark.range(10).toDF("id").repartition(8), "t", input_sig="s1")
    cat.write(spark.range(20).toDF("id").repartition(8), "t", input_sig="s2")
    assert len(cat._snapshots("t")) == 2

    deleted = cat.expire_snapshots("t", keep_last=1)
    assert deleted and len(cat._snapshots("t")) == 1
    assert cat.read("t").count() == 20  # newest survives

    # compact: 8 small files -> 1 full-size file, SAME input signature
    # (resume semantics unchanged), published as a new snapshot
    out = cat.compact("t")
    assert out.count() == 20
    snap_dir = f"{cat._tdir('t')}/{cat._read_pointer('t')['snapshot']}"
    files = [f for f in os.listdir(snap_dir) if f.endswith(".parquet")]
    assert len(files) == 1
    assert cat.exists("t", "s2")  # still resumable under the original sig
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(1).toDF("id")

    assert cat.stage("t", "s2", compute).count() == 20 and calls["n"] == 0


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


def test_config_change_invalidates_dependent_stages(spark, tmp_path, golden_pages, golden_gazetteer):
    """Resuming the same checkpoint dir with a different embedder (or an
    edited gazetteer term at constant row count) must RECOMPUTE
    linked/triples rather than serve stale snapshots."""
    from ner_linking_demo_spark.functions.embedder import HashEmbedder

    pages = pages_to_spark(spark, golden_pages.head(4))
    ckpt = str(tmp_path / "inv")
    r1 = run_pipeline(
        spark, pages, golden_gazetteer, k=3, checkpoint_dir=ckpt,
        embedder=HashEmbedder(seed=42),
    )
    s1 = {tuple(r) for r in r1.triples.select("subj", "code", "rank").collect()}

    # different embedding space, same dir: scores/codes must change with it
    r2 = run_pipeline(
        spark, pages, golden_gazetteer, k=3, checkpoint_dir=ckpt,
        embedder=HashEmbedder(seed=7),
    )
    s2 = {tuple(r) for r in r2.triples.select("subj", "code", "rank").collect()}
    assert s1 != s2  # a stale resume would return s1 verbatim

    # gazetteer content edit at CONSTANT row count: also invalidates
    gaz = golden_gazetteer.copy()
    gaz.loc[gaz.index[0], "term"] = gaz.loc[gaz.index[0], "term"] + " edited"
    r3 = run_pipeline(
        spark, pages, gaz, k=3, checkpoint_dir=ckpt,
        embedder=HashEmbedder(seed=7),
    )
    # the mentions stage depends on the gazetteer: recompute happened if
    # its signature changed — assert via the lineage log (no stale serve)
    import json, os

    lineage = [
        json.loads(line)
        for line in open(os.path.join(ckpt, "_lineage")).read().splitlines()
    ]
    mention_stages = [s for s in lineage if s["table"] == "mentions"]
    sigs = {s["input_sig"] for s in mention_stages}
    assert len(sigs) == 2  # original + edited-gazetteer signature
    assert r3.triples.count() > 0


def test_write_skips_over_unpublished_snap_dirs(spark, tmp_path):
    """A snap dir WITHOUT _META.json (pre-rename-commit checkpoint or a
    partial copy) is invisible to readers but must still be skipped by
    the seq numbering — publishing must never rename onto it."""
    import os

    cat = CheckpointCatalog(spark, str(tmp_path / "mig"))
    os.makedirs(str(tmp_path / "mig/t/snap-00000"), exist_ok=True)
    cat.write(spark.range(3).toDF("id"), "t", input_sig="s")
    assert cat._read_pointer("t")["snapshot"] == "snap-00001"
    assert cat.read("t").count() == 3
    cat.write(spark.range(4).toDF("id"), "t", input_sig="s2")
    assert cat.read("t").count() == 4


def test_coarse_checkpoint_granularity(spark, golden_pages, golden_gazetteer, tmp_path):
    """coarse mode: ONE fused checkpointed stage, triples identical to
    fine mode, rerun resumes without recompute."""
    pages = pages_to_spark(spark, golden_pages.head(8))
    key = ["subj", "pred", "code", "start", "end", "rank"]

    fine = run_pipeline(
        spark, pages, golden_gazetteer, k=3,
        checkpoint_dir=str(tmp_path / "fine"), input_sig="v1",
    )
    coarse = run_pipeline(
        spark, pages, golden_gazetteer, k=3,
        checkpoint_dir=str(tmp_path / "coarse"), input_sig="v1",
        checkpoint_granularity="coarse",
    )
    assert {tuple(r) for r in coarse.triples.select(*key).collect()} == {
        tuple(r) for r in fine.triples.select(*key).collect()
    }
    cat = CheckpointCatalog(spark, str(tmp_path / "coarse"))
    written = {s["table"] for s in cat.lineage() if not s.get("resumed")}
    assert "mentions" not in written  # no separate mentions snapshot

    again = run_pipeline(
        spark, pages, golden_gazetteer, k=3,
        checkpoint_dir=str(tmp_path / "coarse"), input_sig="v1",
        checkpoint_granularity="coarse",
    )
    resumed = {s["table"] for s in cat.lineage() if s.get("resumed")}
    assert {"linked", "triples", "edges"} <= resumed
    assert again.triples.count() == coarse.triples.count()
