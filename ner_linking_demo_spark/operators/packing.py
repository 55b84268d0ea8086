"""Sequence packing: greedy first-fit of documents into training windows
of at most ``max_tokens`` tokens — the batch-construction step of an LLM
pretraining pipeline (maximizes tokens-per-sequence so padding waste
stays low).

Distribution model: token counts are a native projection; docs are
range-partitioned and sorted by id, then ONE iterator UDF per partition
runs the greedy first-fit — the mapInPandas iterator spans the whole
partition, so bin state carries across Arrow batches and the packing is
DETERMINISTIC for a fixed (input, partitions): sequence ids are
(partition, ordinal) pairs. Packing never crosses partitions by design —
at 10^12 docs a global bin-pack is neither tractable nor useful; the
per-partition waste bound is one partial window per open bin.

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

PACKED_SCHEMA = (
    "seq_id string, doc_ids array<long>, n_docs int, "
    "total_tokens long, oversize boolean"
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """docs -> (seq_id, doc_ids, n_docs, total_tokens, oversize).

    ``tokens_col`` supplies precomputed token counts (e.g. from
    annotate_docs); otherwise whitespace token counts are computed in the
    scan projection. Greedy FIRST-FIT over id-sorted docs per partition:
    a doc opens a new sequence only when it fits no open sequence."""
    if tokens_col is None:
        src = docs.select(
            F.col(id_col).cast("long").alias("id"),
            token_count(F.col(text_col)).alias("n_tok"),
        )
    else:
        src = docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(tokens_col).cast("long").alias("n_tok"),
        )
    if num_partitions:
        src = src.repartitionByRange(num_partitions, "id")
    else:
        src = src.repartitionByRange("id")
    src = src.sortWithinPartitions("id")

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # open bins: list of [remaining, doc_ids, total]
        bins: list[list] = []

        def emit() -> pd.DataFrame:
            rows = [
                (
                    f"{pid:05d}-{i:08d}",
                    ids,
                    len(ids),
                    total,
                    total > max_tokens,
                )
                for i, (_, ids, total) in enumerate(bins)
            ]
            return pd.DataFrame(
                rows,
                columns=[
                    "seq_id", "doc_ids", "n_docs", "total_tokens", "oversize"
                ],
            )

        for pdf in batches:
            for doc_id, n_tok in zip(pdf["id"], pdf["n_tok"]):
                n_tok = int(n_tok)
                if n_tok > max_tokens:
                    # remaining = -1: an oversize singleton never accepts
                    # more docs (a 0-token doc would match remaining 0)
                    bins.append([-1, [int(doc_id)], n_tok])
                    continue
                for b in bins:
                    if b[0] >= n_tok:
                        b[0] -= n_tok
                        b[1].append(int(doc_id))
                        b[2] += n_tok
                        break
                else:
                    bins.append(
                        [max_tokens - n_tok, [int(doc_id)], n_tok]
                    )
        if bins:
            yield emit()

    return src.mapInPandas(pack, schema=PACKED_SCHEMA)
