"""Reranking + ensemble operators (reference `server/linking/src/`):

- bi-encoder rerank (W5/M7, `biencoder_ranker.py:90-111`): re-embed the
  candidate terms, score cosine(mention, term), re-sort;
- cross-encoder pair scoring (J6/M6, `crossencoder_ranker.py:137-180`):
  one score per exploded (mention span, candidate term) pair via a
  pluggable pair scorer — the reference's CrossEncoder.predict becomes an
  Arrow-batched pandas UDF with per-worker model state; the deterministic
  surrogate scores cosine under a *distinct seeded projection* so rerank
  order genuinely differs from the retrieval order (tests depend on that);
- ensemble merge (W4, `ensemble.py:37-79`): union candidate lists from N
  generators, sort by score desc, dedupe by term keeping the best score.

All operate on the exploded candidates relation
(url, start, end, label, span, rank, term, code, score) produced by
operators.linking.knn_candidates — mention-scale data, so everything is
window/groupBy over the mention key; model state is broadcast.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..functions.embedder import HashEmbedder, l2_normalize

MENTION_KEY = ["url", "start", "end", "label"]


def biencoder_rerank(
    candidates: DataFrame, embedder: HashEmbedder | None = None
) -> DataFrame:
    """W5: re-embed span and term per candidate row, rescore with cosine,
    re-rank (score desc, original rank asc tiebreak — mirrors the stable
    argsort of `biencoder_ranker.py:97`)."""
    spark = candidates.sparkSession
    embedder = embedder or HashEmbedder()
    bc = spark.sparkContext.broadcast(embedder)

    @F.pandas_udf(T.FloatType())
    def pair_cosine(span: pd.Series, term: pd.Series) -> pd.Series:
        emb = bc.value
        a = l2_normalize(emb.encode(list(span)))
        b = l2_normalize(emb.encode(list(term)))
        return pd.Series((a * b).sum(axis=1).astype(np.float32))

    rescored = candidates.withColumn(
        "rerank_score", pair_cosine("span", "term")
    )
    w = Window.partitionBy(*MENTION_KEY).orderBy(
        F.desc("rerank_score"), F.asc("rank")
    )
    return rescored.withColumn("rerank", F.row_number().over(w) - 1)


class SurrogateCrossEncoder:
    """Deterministic stand-in for the missing CrossEncoder weights: score =
    cosine of the pair under a projection seeded differently from
    retrieval (so reranking is a real reordering). Real models implement
    the same ``predict(pairs) -> np.ndarray`` protocol."""

    def __init__(self, dim: int = 64, seed: int = 777):
        self._emb = HashEmbedder(dim=dim, seed=seed)

    def predict(self, pairs: list[tuple[str, str]]) -> np.ndarray:
        if not pairs:
            return np.zeros(0, dtype=np.float32)
        a = l2_normalize(self._emb.encode([p[0] for p in pairs]))
        b = l2_normalize(self._emb.encode([p[1] for p in pairs]))
        return (a * b).sum(axis=1).astype(np.float32)


def crossencoder_rerank(
    candidates: DataFrame, scorer: SurrogateCrossEncoder | None = None
) -> DataFrame:
    """J6/M6: score each (span, term) pair with the cross-encoder; one
    model call per Arrow batch (iterator UDF, model loaded once per
    worker — the reference loops pairs per mention,
    `crossencoder_ranker.py:137-142`)."""
    spark = candidates.sparkSession
    scorer = scorer or SurrogateCrossEncoder()
    bc = spark.sparkContext.broadcast(scorer)

    schema = T.StructType(
        candidates.schema.fields
        + [T.StructField("ce_score", T.FloatType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = bc.value  # per-worker init happens here for real models
        for pdf in batches:
            scores = model.predict(list(zip(pdf["span"], pdf["term"])))
            out = pdf.copy()
            out["ce_score"] = scores
            yield out

    rescored = candidates.mapInPandas(run, schema=schema)
    w = Window.partitionBy(*MENTION_KEY).orderBy(
        F.desc("ce_score"), F.asc("rank")
    )
    return rescored.withColumn("rerank", F.row_number().over(w) - 1)


def ensemble_merge(*candidate_dfs: DataFrame) -> DataFrame:
    """W4 (`ensemble.py:37-79`): union per-mention candidate lists from N
    generators, keep the best score per (mention, term), re-rank by score
    desc (term asc tiebreak for determinism). Window dedupe replaces the
    reference's per-mention concat-sort-scan loop."""
    if not candidate_dfs:
        raise ValueError("need at least one candidates DataFrame")
    u = candidate_dfs[0]
    for df in candidate_dfs[1:]:
        u = u.unionByName(df)
    w_term = Window.partitionBy(*MENTION_KEY, "term").orderBy(
        F.desc("score"), F.asc("rank")
    )
    deduped = (
        u.withColumn("_rn", F.row_number().over(w_term))
        .filter("_rn = 1")
        .drop("_rn")
    )
    w = Window.partitionBy(*MENTION_KEY).orderBy(
        F.desc("score"), F.asc("term")
    )
    return deduped.withColumn("rank", F.row_number().over(w) - 1)
