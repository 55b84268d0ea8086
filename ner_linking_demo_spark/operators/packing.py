"""Sequence packing: greedy first-fit of documents into training windows
of at most ``max_tokens`` tokens — the batch-construction step of an LLM
pretraining pipeline (maximizes tokens-per-sequence so padding waste
stays low).

Distribution model: token counts are a native projection; docs are
HASH-partitioned on id (a deterministic expression — unlike
``repartitionByRange``, whose boundaries come from reservoir sampling
seeded per-RDD and are NOT stable across sessions) and sorted by id
within each partition, then ONE iterator UDF per partition runs the
greedy first-fit — the mapInPandas iterator spans the whole partition,
so bin state carries across Arrow batches and the packing is
DETERMINISTIC for a fixed (input, partitions): sequence ids are
(partition, creation-ordinal) pairs. Packing never crosses partitions by
design — at 10^12 docs a global bin-pack is neither tractable nor
useful; the per-partition waste bound is one partial window per open
bin.

Memory/probe bounds (the part that matters at multi-million-doc
partitions): a bin leaves the open list — and its row is EMITTED with
the next Arrow batch, not buffered to partition end — as soon as it can
no longer accept a doc:

- oversize singletons close immediately (they never accept more docs);
- bins whose remaining capacity falls below ``close_below`` close
  immediately (default 1: a full bin can only ever accept a 0-token
  doc; pass 0 to reproduce unbounded pure first-fit when 0-token docs
  are meaningful);
- when opening a new bin would exceed ``max_open_bins``, the fullest
  open bin (smallest remaining) is retired first.

So the probe loop costs O(min(open bins, max_open_bins)) per doc and
the UDF holds O(max_open_bins) state, while the output differs from
unbounded first-fit only when a partition accumulates more than
``max_open_bins`` simultaneously-open windows (pure first-fit would
then back-fill the retired bin's slack; the retired bin is the fullest,
so the waste delta is minimal).

Docs longer than ``max_tokens`` become singleton oversize sequences
(flagged, never silently truncated) — the downstream chunker
(functions/fragments.py) is the component that splits them.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import token_count


def packed_schema(id_sql_type: str = "bigint") -> str:
    return (
        f"seq_id string, doc_ids array<{id_sql_type}>, n_docs int, "
        "total_tokens long, oversize boolean"
    )


# long-id default, kept for callers/tests that reference the constant
PACKED_SCHEMA = packed_schema()

_COLUMNS = ["seq_id", "doc_ids", "n_docs", "total_tokens", "oversize"]


class GreedyPacker:
    """Partition-local greedy first-fit with bounded open-bin state.

    Pure-python core (unit-testable without Spark): feed docs in order
    via :meth:`add`, collect closed-bin rows as they retire, then
    :meth:`flush` the still-open bins. Rows are
    (ordinal, doc_ids, n_docs, total_tokens, oversize) with ``ordinal``
    assigned at bin CREATION, so sequence ids are independent of when a
    bin happens to close."""

    def __init__(
        self,
        max_tokens: int,
        max_open_bins: int = 256,
        close_below: int = 1,
    ):
        if max_open_bins < 1:
            raise ValueError("max_open_bins must be >= 1")
        self.max_tokens = max_tokens
        self.max_open_bins = max_open_bins
        self.close_below = close_below
        # open bins: [remaining, doc_ids, total, ordinal]
        self.bins: list[list] = []
        self._next_ordinal = 0
        self.max_open_seen = 0  # bound observability (tests)

    def _row(self, b) -> tuple:
        _, ids, total, ordinal = b
        return (ordinal, ids, len(ids), total, total > self.max_tokens)

    def add(self, doc_id: int, n_tok: int) -> list[tuple]:
        """Place one doc; return rows of any bins this closed."""
        closed: list[tuple] = []
        ordinal = self._next_ordinal
        if n_tok > self.max_tokens:
            # oversize singleton: never accepts more docs -> never open
            self._next_ordinal += 1
            return [(ordinal, [doc_id], 1, n_tok, True)]
        for i, b in enumerate(self.bins):
            if b[0] >= n_tok:
                b[0] -= n_tok
                b[1].append(doc_id)
                b[2] += n_tok
                if b[0] < self.close_below:
                    closed.append(self._row(b))
                    del self.bins[i]
                return closed
        # no open bin fits: open a new one, retiring the fullest first
        # if the open list is at capacity
        if len(self.bins) >= self.max_open_bins:
            i = min(range(len(self.bins)), key=lambda j: self.bins[j][0])
            closed.append(self._row(self.bins[i]))
            del self.bins[i]
        self._next_ordinal += 1
        remaining = self.max_tokens - n_tok
        if remaining < self.close_below:
            closed.append((ordinal, [doc_id], 1, n_tok, False))
            return closed
        self.bins.append([remaining, [doc_id], n_tok, ordinal])
        self.max_open_seen = max(self.max_open_seen, len(self.bins))
        return closed

    def flush(self) -> list[tuple]:
        rows = [self._row(b) for b in self.bins]
        self.bins = []
        return rows


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    num_partitions: int | None = None,
    max_open_bins: int = 256,
    close_below: int = 1,
) -> DataFrame:
    """docs -> (seq_id, doc_ids, n_docs, total_tokens, oversize).

    ``tokens_col`` supplies precomputed token counts (e.g. from
    annotate_docs); otherwise whitespace token counts are computed in the
    scan projection. Greedy FIRST-FIT over id-sorted docs per partition:
    a doc opens a new sequence only when it fits no open sequence (see
    module docstring for the bounded-open-bins retirement policy)."""
    # ids pass through at their own type (long doc ids, string urls, ...):
    # hashing, sorting and the packer treat them opaquely, and the output
    # doc_ids array takes the input's SQL type
    if tokens_col is None:
        src = docs.select(
            F.col(id_col).alias("id"),
            token_count(F.col(text_col)).alias("n_tok"),
        )
    else:
        src = docs.select(
            F.col(id_col).alias("id"),
            F.col(tokens_col).cast("long").alias("n_tok"),
        )
    id_sql_type = dict(src.dtypes)["id"]
    # hash(id) partitioning is a pure function of the value: stable
    # across runs/sessions for a fixed partition count, unlike sampled
    # range boundaries
    if num_partitions:
        src = src.repartition(num_partitions, "id")
    else:
        src = src.repartition("id")
    src = src.sortWithinPartitions("id")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        packer = GreedyPacker(
            max_tokens, max_open_bins=max_open_bins, close_below=close_below
        )

        def frame(rows: list[tuple]) -> pd.DataFrame:
            return pd.DataFrame(
                [
                    (f"{pid:05d}-{ordinal:08d}", ids, n, total, over)
                    for ordinal, ids, n, total, over in rows
                ],
                columns=_COLUMNS,
            )

        for pdf in batches:
            closed: list[tuple] = []
            for doc_id, n_tok in zip(pdf["id"], pdf["n_tok"]):
                closed.extend(packer.add(doc_id, int(n_tok)))
            if closed:
                # emit per Arrow batch: output never buffers the
                # partition, only the open-bin state persists
                yield frame(closed)
        tail = packer.flush()
        if tail:
            yield frame(tail)

    return src.mapInPandas(pack, schema=packed_schema(id_sql_type))
