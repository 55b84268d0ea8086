"""M2: token-classification NER provider — the real-model seat, wired
through the full reference lifecycle M1 -> forward -> A3 -> M3.

Reference flow being reproduced
(`/root/reference/server/ner/scripts/mentions_detection.py:185-241`,
`server/ner/src/utils/ner/post_process.py:619-666`):

    words -> subtoken fragments (M1, functions/fragments.py)
          -> per-subtoken class probabilities (model forward, M2)
          -> per-word probability = product of its subtokens' probs (A3;
             accumulated as a log-sum, robust across fragment boundaries —
             the greedy packer MAY split a word across fragments)
          -> argmax -> IOB tags (F9)
          -> continuous-span decode (M3, operators/iob.decode_iob_scan)

``TokenClassifierProvider`` is the pluggable seat: anything exposing
``predict(fragments) -> float64[n_fragments, seq_len, n_labels]`` drops in
(a HF RoBERTa head satisfies it with one wrapper). The deterministic
surrogate below derives per-subtoken logits from md5 of the subtoken
piece, so the ENTIRE chain — packing, log-prob accumulation, argmax
tie-break, IOB decode — is cross-checkable in DuckDB SQL (the correctness
harness reproduces it value-for-value; plans/kg_oracles.iob_detect_sql).

Labels are ordered (B, I, O); argmax ties resolve to the lowest index
(numpy argmax semantics, reference `post_process.py:640`).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

from .fragments import Fragment

LABELS = ("B", "I", "O")


def piece_logits(piece: str, salt: str = "") -> list[float]:
    """Deterministic pseudo-logits in [0,1] per class: the first 8 hex
    digits of md5('{salt}{piece}|{label}') scaled by 2^32-1. Reproducible
    in any engine with md5 (the DuckDB oracle computes the same
    expression); ``salt`` makes distinct surrogate models for ensembles."""
    return [
        int(hashlib.md5(f"{salt}{piece}|{lab}".encode()).hexdigest()[:8], 16)
        / 0xFFFFFFFF
        for lab in LABELS
    ]


def softmax3(logits: list[float]) -> list[float]:
    es = [math.exp(x) for x in logits]
    s = es[0] + es[1] + es[2]  # fixed left-to-right order (oracle parity)
    return [e / s for e in es]


class HashTokenClassifier:
    """Surrogate token classifier: per-subtoken softmax over hash logits.

    Stateless and picklable (broadcast-safe); memoizes piece probabilities
    per python worker — subtoken vocabularies are tiny relative to corpus
    text, the same argument as the embedder's gram cache."""

    labels = LABELS

    def __init__(self, salt: str = "") -> None:
        self.salt = salt
        self._cache: dict[str, list[float]] = {}

    def __getstate__(self):
        return {"salt": self.salt}

    def __setstate__(self, state):
        self.salt = state.get("salt", "")
        self._cache = {}

    def piece_probs(self, piece: str) -> list[float]:
        p = self._cache.get(piece)
        if p is None:
            p = softmax3(piece_logits(piece, self.salt))
            if len(self._cache) < 1_000_000:
                self._cache[piece] = p
        return p

    def predict(self, fragments: list[Fragment]) -> np.ndarray:
        """[n_fragments, seq_len, 3] class probabilities; special/pad
        positions get a uniform distribution (they are masked out by
        word_ids == -1 downstream, as in the reference)."""
        if not fragments:
            return np.full((0, 0, 3), 1 / 3)
        seq_len = len(fragments[0].subtokens)
        out = np.full((len(fragments), seq_len, 3), 1 / 3, dtype=np.float64)
        for fi, frag in enumerate(fragments):
            for pos, (piece, wid) in enumerate(
                zip(frag.subtokens, frag.word_ids)
            ):
                if wid >= 0:
                    out[fi, pos] = self.piece_probs(piece)
        return out


def word_tags_from_probs(
    fragments: list[Fragment], probs: np.ndarray
) -> tuple[list[str], list[tuple[int, int]]]:
    """A3 + F9: per-word log-prob sums across subtokens (fragment-boundary
    safe), argmax -> IOB tag per word, with the word char offsets."""
    acc: dict[int, np.ndarray] = {}
    offs: dict[int, tuple[int, int]] = {}
    for fi, frag in enumerate(fragments):
        for pos, wid in enumerate(frag.word_ids):
            if wid < 0:
                continue
            lp = np.log(probs[fi, pos])
            if wid in acc:
                acc[wid] = acc[wid] + lp
            else:
                acc[wid] = lp
                offs[wid] = frag.offsets[pos]
    wids = sorted(acc)
    tags = [LABELS[int(np.argmax(acc[w]))] for w in wids]
    return tags, [offs[w] for w in wids]


class EnsembleTokenClassifier:
    """A5: element-wise merge of N models' word-prob tensors (reference
    `post_process.py:796-856`, strategy switch at :837-845 — max / prod /
    sum over the models axis). The combined tensor is NOT renormalized
    (matching the reference): only argmax consumes it downstream, and
    argmax is scale-invariant per strategy.

    Any objects exposing ``predict(fragments) -> [n, seq, n_labels]``
    compose — real transformer heads and hash surrogates alike."""

    labels = LABELS

    def __init__(self, classifiers, strategy: str = "prod"):
        if strategy not in ("max", "prod", "sum"):
            raise ValueError(f"unknown ensemble strategy: {strategy!r}")
        if not classifiers:
            raise ValueError("need at least one classifier")
        self.classifiers = list(classifiers)
        self.strategy = strategy

    def predict(self, fragments: list[Fragment]) -> np.ndarray:
        stack = np.stack([c.predict(fragments) for c in self.classifiers])
        if self.strategy == "max":
            return stack.max(axis=0)
        if self.strategy == "sum":
            return stack.sum(axis=0)
        return stack.prod(axis=0)


def word_tags_crf_vote(
    fragments: list[Fragment], probs: np.ndarray
) -> tuple[list[str], list[tuple[int, int]]]:
    """CRF-style word converter (reference `post_process.py:79-91`,
    ``CRFAllWordPreds``): each subtoken votes its argmax class; the word's
    tag = argmax of the relative-frequency histogram (np.argmax
    lowest-index tie-break — B beats I beats O on equal votes).
    Alternative to the prob-product converter (word_tags_from_probs)."""
    votes: dict[int, np.ndarray] = {}
    offs: dict[int, tuple[int, int]] = {}
    for fi, frag in enumerate(fragments):
        for pos, wid in enumerate(frag.word_ids):
            if wid < 0:
                continue
            if wid not in votes:
                votes[wid] = np.zeros(len(LABELS), dtype=np.int64)
                offs[wid] = frag.offsets[pos]
            votes[wid][int(np.argmax(probs[fi, pos]))] += 1
    wids = sorted(votes)
    tags = [LABELS[int(np.argmax(votes[w]))] for w in wids]
    return tags, [offs[w] for w in wids]
