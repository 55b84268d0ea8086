"""S4: term-embedding persistence — the compute-once dimension-table build
replacing the reference's ``.npy`` memoization
(`/root/reference/server/linking/src/candidates/faisslm.py:110-124`).

``build_or_load`` computes gazetteer term embeddings once per
(label, gazetteer content, embedder config) and persists them as a
parquet table ``(label, ordinal, term, code, embedding array<float>)``;
subsequent runs load instead of re-encoding — at web scale this is the
classic dim-table precompute job feeding the broadcast index.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from ..functions.embedder import HashEmbedder
from ..functions.term_index import TermIndex, build_term_index


def gaz_content_hash(gaz_pdf: pd.DataFrame) -> str:
    """Order-independent content hash of (label, code, term, semantic_tag).

    Used both here (embedding-cache key) and as the gazetteer component of
    checkpoint-stage signatures (plans/pipeline.py) — editing any term,
    code, or tag invalidates dependent snapshots even when the row count
    is unchanged (round-1 advice)."""
    h = hashlib.md5()
    tags = (
        gaz_pdf["semantic_tag"].astype(str)
        if "semantic_tag" in gaz_pdf.columns
        else [""] * len(gaz_pdf)
    )
    for label, code, term, tag in sorted(
        zip(gaz_pdf["label"], gaz_pdf["code"].astype(str), gaz_pdf["term"], tags)
    ):
        h.update(f"{label}\x1f{code}\x1f{term}\x1f{tag}\x1e".encode())
    return h.hexdigest()


def _gaz_fingerprint(gaz_pdf: pd.DataFrame, embedder: HashEmbedder) -> str:
    h = hashlib.md5(gaz_content_hash(gaz_pdf).encode())
    h.update(f"dim{embedder.dim}seed{embedder.seed}".encode())
    return h.hexdigest()


def build_or_load(
    spark,
    gaz_pdf: pd.DataFrame,
    cache_dir: str,
    k: int = 3,
    embedder: HashEmbedder | None = None,
) -> dict[str, TermIndex]:
    """Return per-label TermIndexes, loading embeddings from the cache
    table when the gazetteer fingerprint matches (else compute + persist).
    """
    embedder = embedder or HashEmbedder()
    fp = _gaz_fingerprint(gaz_pdf, embedder)
    path = os.path.join(cache_dir, f"term_embeddings_{fp}.parquet")

    if os.path.exists(path):
        cached = pd.read_parquet(path)
        indexes: dict[str, TermIndex] = {}
        for label, sub in cached.groupby("label"):
            sub = sub.sort_values("ordinal")
            matrix = np.stack(sub["embedding"].to_numpy()).astype(np.float32)
            terms = list(sub["term"])
            codes = list(sub["code"])
            from ..functions.term_index import max_n_texts_for

            indexes[str(label).upper()] = TermIndex(
                label=str(label),
                terms=terms,
                codes=codes,
                matrix=matrix,
                k=k,
                max_n_texts=max_n_texts_for(dict(zip(terms, codes)), k),
            )
        return indexes

    indexes = {
        str(label).upper(): build_term_index(gaz_pdf, str(label), k=k, embedder=embedder)
        for label in sorted(set(gaz_pdf["label"]))
    }
    rows = []
    for label_u, idx in indexes.items():
        for i, (term, code) in enumerate(zip(idx.terms, idx.codes)):
            rows.append(
                {
                    "label": idx.label,
                    "ordinal": i,
                    "term": term,
                    "code": code,
                    "embedding": idx.matrix[i],
                }
            )
    os.makedirs(cache_dir, exist_ok=True)
    pd.DataFrame(rows).to_parquet(path, index=False)
    return indexes
