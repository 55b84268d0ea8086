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

Caveats (documented, not hidden): the rename is atomic on POSIX and HDFS
— and it now actually runs through the Hadoop FileSystem API resolved
from ``out_dir``'s scheme (round-2 advice: the old ``os.replace`` /
``os.path.exists`` silently operated on nonexistent LOCAL paths when
``out_dir`` was ``hdfs://``/``s3a://``, so batches were never published).
On S3-like stores rename is copy+delete (not atomic): use a committer or
read-side dedupe on the embedded ``batch_id`` partition column, which is
written into the layout for exactly that purpose. Single-driver
assumption as with the checkpoint catalog (plans/catalog.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import run_pipeline


class _HadoopFS:
    """Thin wrapper over ``org.apache.hadoop.fs.FileSystem`` resolved
    from the path's scheme — exists/rename/mkdirs work uniformly for
    file://, hdfs://, s3a://... (driver-side control-plane calls only;
    data still moves through Spark writers)."""

    def __init__(self, spark: SparkSession, root: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._Path(path))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._Path(path))

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._Path(src), self._Path(dst)):
            raise IOError(f"publish rename failed: {src} -> {dst}")


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
    root = out_dir.rstrip("/")
    triples_root = f"{root}/triples"
    staging_root = f"{root}/_staging"
    fs = _HadoopFS(spark, root)
    fs.mkdirs(triples_root)
    fs.mkdirs(staging_root)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        final = f"{triples_root}/batch_id={batch_id}"
        if fs.exists(final):
            return  # replayed micro-batch: already published atomically
        res = run_pipeline(spark, batch_df, gazetteer_pdf, k=k)
        staging = f"{staging_root}/batch-{batch_id}"
        # overwrite: a crashed earlier attempt may have left partial staging
        res.triples.write.mode("overwrite").parquet(staging)
        fs.rename(staging, final)  # single atomic publish == commit record

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
