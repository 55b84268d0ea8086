"""Streaming deduplication: exact content dedup across micro-batches.

A long-running ingest cannot re-run the batch dedup over the full corpus
per micro-batch; it needs FIRST-SEEN semantics with state the engine
manages. Two shapes, both over the same ``content_hash = md5(text)`` key
the batch `operators/dedup.exact_dedup` uses:

- :func:`streaming_exact_dedup` with a watermark —
  ``dropDuplicatesWithinWatermark``: state is bounded by the event-time
  horizon (duplicates arriving farther apart than the watermark pass
  through — the documented contract, matching how web-crawl dedup is
  actually run: dedup-within-horizon streaming, full-corpus batch dedup
  periodically). This is the 100-TB posture: state size follows the
  horizon's distinct-hash count, not the stream's.
- without a watermark — plain ``dropDuplicates``: exact global
  first-seen, but state grows with every distinct hash forever; only
  for bounded replays (availableNow drains), never a long-running
  ingest. The function refuses silently unbounded state unless
  ``allow_unbounded_state=True``.

State lives in the streaming checkpoint like any stateful operator;
parallelism follows the shuffle partitioning on ``content_hash`` (a
uniform hash — no skew story, unlike entity keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str | None = None,
    allow_unbounded_state: bool = False,
) -> DataFrame:
    """docs readStream -> first-seen docs (+ ``content_hash``).

    With ``event_time_col`` + ``watermark``: duplicates within the
    watermark horizon are dropped, state is evicted past it. Without:
    global first-seen with unbounded state (explicit opt-in)."""
    hashed = docs_stream.withColumn(
        "content_hash", F.md5(F.col(text_col))
    )
    if watermark is not None:
        if event_time_col is None:
            raise ValueError("watermark requires event_time_col")
        return hashed.withWatermark(
            event_time_col, watermark
        ).dropDuplicatesWithinWatermark(["content_hash"])
    if not allow_unbounded_state:
        raise ValueError(
            "no watermark: global first-seen dedup keeps one state row "
            "per distinct hash FOREVER; pass allow_unbounded_state=True "
            "for bounded replays, or provide event_time_col + watermark"
        )
    return hashed.dropDuplicates(["content_hash"])
