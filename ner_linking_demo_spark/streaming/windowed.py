"""Native Structured-Streaming operators: watermarked windowed mention
aggregation and a custom stateful first-seen tracker.

The incremental wrapper (streaming/incremental.py) reuses the batch plan
per micro-batch; these two use streaming-native state so late data and
cross-batch memory behave the way a long-running ingest needs:

- :func:`mention_rate_stream` — event-time windowed counts with a
  watermark: late pages (warc_ts older than the watermark) are folded in
  while their window is open and dropped once state is evicted — the
  canonical readStream -> transform -> windowed-agg shape. NER runs as
  the same Arrow-batched UDF as the batch path (mapInPandas operates on
  streaming DataFrames unchanged).
- :func:`first_seen_codes_stream` — ``applyInPandasWithState``: emits
  each entity code the FIRST time any page links it, with the timestamp;
  state = one boolean per code group, so the operator's memory is
  bounded by the vocabulary (dimension-sized), not the stream.

At cluster scale both checkpoint their state to the streaming checkpoint
location; parallelism follows the shuffle partitioning of the group keys
(window/code), with hot codes subject to the same AQE/salting story as
the batch aggregations (SCALE.md).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def mention_rate_stream(
    pages_stream: DataFrame,
    gazetteer_pdf,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """pages readStream -> watermarked per-(window, label) mention counts.

    Returns a streaming DataFrame (window struct, label, n_mentions);
    attach your sink with ``writeStream`` (append mode emits a window
    once its watermark passes — the late-data contract)."""
    from ..functions.matcher import DictionaryMatcher

    spark = pages_stream.sparkSession
    terms_by_label = {
        str(label): list(sub["term"])
        for label, sub in gazetteer_pdf.groupby("label")
    }
    bc = spark.sparkContext.broadcast(terms_by_label)

    # The event time rides THROUGH the NER UDF (one mention row carries
    # its page's warc_ts) — a single-input plan; a post-hoc stream-stream
    # rejoin by url would forbid complete-mode sinks and double-shuffle.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = DictionaryMatcher(bc.value)
        for pdf in batches:
            ts_out, label_out = [], []
            for text, ts in zip(pdf["text"], pdf["_ts"]):
                for label, _s, _e, _sp in matcher.find_mentions(text):
                    ts_out.append(ts)
                    label_out.append(label.upper())
            # explicit dtypes: an empty list would infer float64 and fail
            # the Arrow cast to timestamp
            yield pd.DataFrame(
                {
                    "_ts": pd.Series(pd.to_datetime(ts_out)),
                    "label": pd.Series(label_out, dtype="object"),
                }
            )

    timed = (
        pages_stream.select(F.col(ts_col).alias("_ts"), "text")
        .mapInPandas(run, schema="_ts timestamp, label string")
        .withWatermark("_ts", watermark)
    )
    return (
        timed.groupBy(F.window("_ts", window).alias("window"), "label")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
    )


FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("code", T.StringType(), False),
        T.StructField("first_url", T.StringType(), True),
        T.StructField("n_in_batch", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), True)])


def first_seen_codes_stream(linked_codes: DataFrame) -> DataFrame:
    """(url, code) stream -> one output row per code, on the micro-batch
    where it is first seen (custom stateful operator per the north-star's
    applyInPandasWithState seat).

    State per code group: a single boolean. Emits (code, first_url with
    min url for determinism, n_in_batch) once; later batches with the
    same code emit nothing."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:  # before materializing rows: hot codes hit this
            return iter([])  # every batch — keep them O(1), not O(rows)
        rows = pd.concat(list(pdfs))
        state.update((True,))
        return iter(
            [
                pd.DataFrame(
                    {
                        "code": [key[0]],
                        "first_url": [rows["url"].min()],
                        "n_in_batch": [len(rows)],
                    }
                )
            ]
        )

    return linked_codes.groupBy("code").applyInPandasWithState(
        fn,
        outputStructType=FIRST_SEEN_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
