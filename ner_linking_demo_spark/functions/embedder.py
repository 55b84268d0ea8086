"""Deterministic surrogate sentence embedder (stands in for SapBERT).

The reference embeds gazetteer terms and mention spans with a
SentenceTransformer (`/root/reference/server/linking/src/candidates/
faisslm.py:71-106`) whose weights are missing from the repo
(`server/ner/models/model_checkpoints/README.md:1`). Golden parity is
therefore defined against a *pluggable* embedding provider; tests and the
pandas oracle share this deterministic surrogate (SURVEY.md §2.9 note).

Design: seeded hashed character n-grams -> signed counts -> L2 normalize.
- Pure function of (text, dim, seed): identical on driver, executors and
  oracle — no RNG state, no model files.
- Character n-grams give real lexical-similarity structure, so nearest-
  neighbour retrieval is meaningful (a mention retrieves its own surface
  form first, close variants next).
- float32 throughout, matching the reference's index dtype
  (``faisslm.py:120-122``), so scores compare bit-for-bit between the
  Spark path and the oracle.

The real-model path implements the same ``encode(list[str]) -> np.ndarray``
protocol; swapping SapBERT in changes no operator code (ModelProvider
pattern, SURVEY.md §7 hard-part f).
"""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_DIM = 64
DEFAULT_SEED = 42
_NGRAM = 3


class HashEmbedder:
    """Seeded hash-projection embedder. encode() is vectorization-friendly:
    one call per Arrow batch, never per row from the driver."""

    def __init__(self, dim: int = DEFAULT_DIM, seed: int = DEFAULT_SEED):
        self.dim = dim
        self.seed = seed
        self._key = f"nlds-embed-{seed}".encode()
        # n-gram vocabularies (and mention surface forms — hot entities
        # repeat massively in web corpora) are small relative to corpus
        # text: memoize gram -> (slot, sign) and text -> vector per
        # embedder instance (one per python worker). Pure-function caches.
        self._gram_cache: dict[str, tuple[int, float]] = {}
        self._vec_cache: dict[str, np.ndarray] = {}

    def _gram_slot(self, gram: str) -> tuple[int, float]:
        cached = self._gram_cache.get(gram)
        if cached is not None:
            return cached
        h = hashlib.blake2b(gram.encode("utf-8"), key=self._key, digest_size=8)
        v = int.from_bytes(h.digest(), "big")
        out = (v % self.dim, 1.0 if (v >> 32) & 1 else -1.0)
        if len(self._gram_cache) < 2_000_000:
            self._gram_cache[gram] = out
        return out

    def __getstate__(self):  # keep broadcasts small: don't ship caches
        state = self.__dict__.copy()
        state["_gram_cache"] = {}
        state["_vec_cache"] = {}
        return state

    def encode_one(self, text: str) -> np.ndarray:
        cached = self._vec_cache.get(text)
        if cached is not None:
            return cached
        vec = np.zeros(self.dim, dtype=np.float32)
        padded = f"\x02{text}\x03"
        slot = self._gram_slot
        for i in range(max(len(padded) - _NGRAM + 1, 1)):
            s, sign = slot(padded[i : i + _NGRAM])
            vec[s] += sign
        vec.setflags(write=False)  # cached vectors must stay immutable
        if len(self._vec_cache) < 500_000:
            self._vec_cache[text] = vec
        return vec

    def encode(self, texts: list[str] | np.ndarray, normalize: bool = False) -> np.ndarray:
        mat = np.stack([self.encode_one(t) for t in texts]) if len(texts) else np.zeros(
            (0, self.dim), dtype=np.float32
        )
        if normalize:
            mat = l2_normalize(mat)
        return mat.astype(np.float32)


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    """L2-normalize rows (reference: ``faiss.normalize_L2`` at
    ``faisslm.py:140,202``) — inner product on normalized vectors equals
    cosine similarity. Zero rows map to a deterministic unit vector."""
    mat = mat.astype(np.float32, copy=True)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    zero = norms[:, 0] == 0.0
    if zero.any():
        mat[zero, 0] = 1.0
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return (mat / norms).astype(np.float32)
