"""Incremental ingest wrapper: run the batch KG pipeline per micro-batch.

``foreachBatch`` is the idiomatic bridge when the transformation is a
mature batch plan (broadcast state, multi-output writes) rather than a
native streaming aggregation; each micro-batch gets the fused
pages->linked->triples plan and appends to the output location.
Exactly-once: batch ids are recorded next to the output so a replayed
micro-batch (restart from the streaming checkpoint) is skipped.
"""

from __future__ import annotations

import json
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
    """pages readStream -> per-micro-batch KG pipeline -> parquet appends.

    ``trigger_once=True`` (availableNow) drains what's there and stops —
    the batch-job-with-streaming-bookkeeping mode; ``False`` runs
    continuously."""
    os.makedirs(out_dir, exist_ok=True)
    seen_path = os.path.join(out_dir, "_batches.json")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        seen = set()
        if os.path.exists(seen_path):
            with open(seen_path) as f:
                seen = set(json.load(f))
        if batch_id in seen:
            return  # replayed micro-batch: already committed
        res = run_pipeline(spark, batch_df, gazetteer_pdf, k=k)
        res.triples.write.mode("append").parquet(
            os.path.join(out_dir, "triples")
        )
        seen.add(batch_id)
        tmp = seen_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(seen), f)
        os.replace(tmp, seen_path)

    writer = (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
