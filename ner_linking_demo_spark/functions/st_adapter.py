"""HuggingFace adapters for the embedding and rerank model seats.

The engine's linking stage is built around three injectable model seats:

- the sentence embedder (``encode(texts, normalize=False) -> float32
  [n, dim]`` plus ``.dim``/``.seed`` identity attributes) used by the
  FAISS-equivalent term index, kNN candidates and the bi-encoder
  reranker — filled by the deterministic surrogate
  ``functions.embedder.HashEmbedder`` in tests/benchmarks;
- the cross-encoder pair scorer (``predict(pairs) -> float32 [n]``)
  used by ``operators.rerank.crossencoder_rerank`` — filled by
  ``SurrogateCrossEncoder``;
- the bi-encoder rerank embedder — same protocol as the sentence
  embedder, passed to ``operators.rerank.biencoder_rerank``.

This module fills those SAME seats with real HuggingFace checkpoints,
mirroring the reference's production path:

- `server/linking/src/candidates/faisslm.py:71-106` builds a
  SentenceTransformer from a masked-LM encoder + a mean ("mask") or CLS
  ("cls") pooling head, then L2-normalizes (`faiss.normalize_L2`,
  `faisslm.py:140,202`) so inner product == cosine;
- `server/linking/src/reranking/biencoder_ranker.py:90-97` re-encodes
  mention + candidate texts and sorts by `util.cos_sim`;
- `server/linking/src/reranking/crossencoder_ranker.py:137-142` scores
  `[entity, candidate]` pairs with `CrossEncoder.predict`.

The sandbox this engine is developed in ships neither ``transformers``
nor torch, so (same contract as ``functions.hf_adapter``):

- every transformers import is lazy and produces a clear ImportError
  naming the missing dependency (never a silent stub result);
- the ``loader(model_name) -> (tokenizer, model)`` seat is INJECTABLE —
  tests drive the full tokenize -> ids/mask -> forward -> pool ->
  normalize plumbing (and the whole linking chain through it) with a
  deterministic fake, proving Spark-side behavior (broadcast pickling,
  per-worker lazy load, padding masks, batching) without weights.

Executor lifecycle: adapters pickle WITHOUT loaded weights; the model
reloads lazily per python worker on first use — combined with the
iterator/Arrow-batched UDFs in linking/rerank this means one model load
per worker process, not per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)

from .embedder import l2_normalize


def _default_encoder_loader(model_name: str):
    try:
        from transformers import AutoModel, AutoTokenizer
    except ImportError as e:
        raise ImportError(
            "the transformers package is not installed in this "
            "environment; HFSentenceEmbedder needs `pip install "
            "transformers torch` plus the checkpoint "
            f"{model_name!r}. For a deterministic no-dependency "
            "embedder use functions.embedder.HashEmbedder (the same "
            "seat)."
        ) from e
    tok = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name)
    model.eval()
    return tok, model


def _default_cross_loader(model_name: str):
    try:
        from transformers import (
            AutoModelForSequenceClassification,
            AutoTokenizer,
        )
    except ImportError as e:
        raise ImportError(
            "the transformers package is not installed in this "
            "environment; HFCrossEncoder needs `pip install "
            "transformers torch` plus the checkpoint "
            f"{model_name!r}. For a deterministic no-dependency "
            "pair scorer use operators.rerank.SurrogateCrossEncoder "
            "(the same seat)."
        ) from e
    tok = AutoTokenizer.from_pretrained(model_name)
    model = AutoModelForSequenceClassification.from_pretrained(model_name)
    model.eval()
    return tok, model


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float64)


def _forward(model, ids: np.ndarray, mask: np.ndarray):
    """Run the model on (ids, mask). Torch tensors exist only inside
    this function: a real torch module gets real tensors under
    no_grad; a fake model (tests) accepts and returns plain numpy."""
    try:
        import torch

        if isinstance(model, torch.nn.Module):
            with torch.no_grad():
                return model(
                    input_ids=torch.as_tensor(ids),
                    attention_mask=torch.as_tensor(mask),
                )
    except ImportError:
        pass
    return model(input_ids=ids, attention_mask=mask)


def _batch_tokenize(tok, texts, max_length: int):
    """tokenizer -> rectangular (ids, mask) numpy pair. Works with real
    HF tokenizers (BatchEncoding) and dict-returning fakes alike."""
    enc = tok(
        list(texts),
        padding=True,
        truncation=True,
        max_length=max_length,
    )
    return (
        np.asarray(enc["input_ids"]),
        np.asarray(enc["attention_mask"]),
    )


class HFSentenceEmbedder:
    """Embedder seat backed by a HF encoder checkpoint (the
    SentenceTransformer-equivalent of `faisslm.py:71-106`).

    ``pooling``: ``"cls"`` (reference model_type "cls" — first-token
    hidden state) or ``"mean"`` (model_type "mask" — attention-masked
    mean over token hidden states). ``dim`` must state the checkpoint's
    hidden size up front (broadcast consumers size buffers before any
    worker has loaded weights); it is validated against the first real
    forward pass.

    Protocol parity with HashEmbedder: ``encode(texts, normalize=False)
    -> float32 [n, dim]``, ``.dim``, and ``.seed`` (here a stable
    identity string so embeddings-cache fingerprints
    (`sources/embeddings_cache.py:46`) distinguish checkpoints exactly
    like surrogate seeds).
    """

    def __init__(
        self,
        model_name: str,
        dim: int,
        pooling: str = "cls",
        max_length: int = 256,
        batch_size: int = 256,
        loader=None,
    ) -> None:
        if pooling not in ("cls", "mean"):
            raise ValueError(
                "pooling must be 'cls' or 'mean' (reference model_type "
                "'cls'/'mask', faisslm.py:71-106)"
            )
        self.model_name = model_name
        self.dim = int(dim)
        self.pooling = pooling
        self.max_length = int(max_length)
        self.batch_size = int(batch_size)
        self._loader = loader
        self._tok = None
        self._model = None

    @property
    def seed(self) -> str:
        return f"hf:{self.model_name}:{self.pooling}"

    # -- executor lifecycle: pickle the config, never the weights ------
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_tok"] = None
        state["_model"] = None
        return state

    def _ensure_loaded(self):
        if self._model is None:
            loader = self._loader or _default_encoder_loader
            self._tok, self._model = loader(self.model_name)
        return self._tok, self._model

    def encode(self, texts, normalize: bool = False) -> np.ndarray:
        if not len(texts):
            return np.zeros((0, self.dim), dtype=np.float32)
        tok, model = self._ensure_loaded()
        chunks = []
        texts = list(texts)
        for lo in range(0, len(texts), self.batch_size):
            chunk = texts[lo : lo + self.batch_size]
            ids, mask = _batch_tokenize(tok, chunk, self.max_length)
            res = _forward(model, ids, mask)
            hidden = _to_numpy(
                res["last_hidden_state"]
                if isinstance(res, dict)
                else res.last_hidden_state
            )  # [n, seq, hid] in float64 — pooling happens at full
            # precision, cast to float32 once at the end
            if hidden.shape[-1] != self.dim:
                raise ValueError(
                    f"checkpoint {self.model_name!r} has hidden size "
                    f"{hidden.shape[-1]}, but this embedder was "
                    f"declared dim={self.dim}"
                )
            if self.pooling == "cls":
                pooled = hidden[:, 0, :]
            else:
                m = mask.astype(np.float64)[:, :, None]
                denom = np.maximum(m.sum(axis=1), 1.0)
                pooled = (hidden * m).sum(axis=1) / denom
            chunks.append(pooled)
        mat = np.concatenate(chunks, axis=0).astype(np.float32)
        if normalize:
            mat = l2_normalize(mat)
        return mat


def _default_tokenizer_loader(model_name: str):
    try:
        from transformers import AutoTokenizer
    except ImportError as e:
        raise ImportError(
            "the transformers package is not installed in this "
            "environment; HFTokenCounter needs `pip install "
            "transformers` plus the tokenizer files for "
            f"{model_name!r}. For no-dependency counting use "
            "functions.text_analysis.token_count / "
            "bpe_ish_token_count (the same seat, heuristic)."
        ) from e
    return AutoTokenizer.from_pretrained(model_name)


class HFTokenCounter:
    """Real-tokenizer token-count seat (round-5 verdict item 8).

    Sequence-packing windows and mixing budgets at 100 TB are
    denominated in the TRAINING tokenizer's tokens; the engine's
    heuristics (``text_analysis.token_count`` whitespace counts,
    ``bpe_ish_token_count`` pre-BPE segmentation — both unchanged
    defaults) approximate that. This adapter fills the same seat with a
    real HuggingFace tokenizer: ``count(texts)`` = length of
    ``tokenizer(texts, add_special_tokens=False)['input_ids']`` per
    text, and ``column()`` wraps it as an Arrow-batched pandas UDF
    (NULL text counts 0). ``loader(model_name) -> tokenizer`` is
    injectable; pickling drops the loaded tokenizer and reloads lazily
    per worker (one load per python worker, the house adapter
    lifecycle). ``fingerprint`` pins checkpoint signatures so a
    tokenizer change can never silently resume token-gated snapshots.
    """

    def __init__(self, model_name: str, loader=None) -> None:
        self.model_name = model_name
        self._loader = loader
        self._tok = None

    @property
    def fingerprint(self) -> str:
        return f"hftc:{self.model_name}"

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_tok"] = None
        return state

    def _ensure_loaded(self):
        if self._tok is None:
            loader = self._loader or _default_tokenizer_loader
            self._tok = loader(self.model_name)
        return self._tok

    def count(self, texts) -> list:
        texts = list(texts)
        if not texts:
            return []
        tok = self._ensure_loaded()
        enc = tok(texts, add_special_tokens=False)
        return [len(ids) for ids in enc["input_ids"]]

    def column(self):
        """pandas_udf: text -> long token count (NULL -> 0)."""
        from pyspark.sql import functions as F

        counter = self

        @F.pandas_udf("long")
        def n_tok(s: pd.Series) -> pd.Series:
            mask = s.notna()
            out = pd.Series(0, index=s.index, dtype="int64")
            if mask.any():
                out[mask] = counter.count(list(s[mask]))
            return out

        return n_tok


class HFCrossEncoder:
    """Cross-encoder pair-scorer seat backed by a HF
    sequence-classification checkpoint (`crossencoder_ranker.py:137-142`
    drives sentence_transformers' CrossEncoder.predict the same way).

    ``predict(pairs) -> float32 [n]`` where pairs are ``(mention_span,
    candidate_term)`` tuples — each pair is tokenized as a text /
    text_pair sequence (one [SEP]-joined input, the cross-encoder
    architecture).

    ``activation``: ``"sigmoid"`` (default — sentence_transformers'
    default for single-logit heads; strictly monotonic, so rerank ORDER
    is identical to the raw logit) or ``"identity"`` (raw logit). Heads
    with 2 labels score as softmax P(label 1) regardless.
    """

    def __init__(
        self,
        model_name: str,
        max_length: int = 256,
        batch_size: int = 256,
        activation: str = "sigmoid",
        loader=None,
    ) -> None:
        if activation not in ("sigmoid", "identity"):
            raise ValueError("activation must be 'sigmoid' or 'identity'")
        self.model_name = model_name
        self.max_length = int(max_length)
        self.batch_size = int(batch_size)
        self.activation = activation
        self._loader = loader
        self._tok = None
        self._model = None

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_tok"] = None
        state["_model"] = None
        return state

    def _ensure_loaded(self):
        if self._model is None:
            loader = self._loader or _default_cross_loader
            self._tok, self._model = loader(self.model_name)
        return self._tok, self._model

    def predict(self, pairs) -> np.ndarray:
        pairs = list(pairs)
        if not pairs:
            return np.zeros(0, dtype=np.float32)
        tok, model = self._ensure_loaded()
        out = []
        for lo in range(0, len(pairs), self.batch_size):
            chunk = pairs[lo : lo + self.batch_size]
            enc = tok(
                [p[0] for p in chunk],
                [p[1] for p in chunk],
                padding=True,
                truncation=True,
                max_length=self.max_length,
            )
            ids = np.asarray(enc["input_ids"])
            mask = np.asarray(enc["attention_mask"])
            res = _forward(model, ids, mask)
            logits = _to_numpy(
                res["logits"] if isinstance(res, dict) else res.logits
            )
            if logits.ndim != 2:
                raise ValueError(
                    f"expected [n, n_labels] logits, got shape "
                    f"{logits.shape}"
                )
            if logits.shape[1] == 1:
                scores = logits[:, 0]
                if self.activation == "sigmoid":
                    scores = 1.0 / (1.0 + np.exp(-scores))
            elif logits.shape[1] == 2:
                exp = np.exp(logits - logits.max(axis=1, keepdims=True))
                scores = (exp / exp.sum(axis=1, keepdims=True))[:, 1]
            else:
                raise ValueError(
                    f"cross-encoder head has {logits.shape[1]} labels; "
                    "expected 1 (regression/sigmoid) or 2 (binary)"
                )
            out.append(scores)
        return np.concatenate(out).astype(np.float32)
