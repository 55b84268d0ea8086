"""HuggingFace-transformers adapter for the NER model seat.

The engine's NER chain (operators/ner.TokenClassifierMentionProvider)
is built around two injectable seats: a ``subtokenizer`` (word ->
word-piece strings, functions/fragments.fragment_document) and a
``classifier`` (``predict(fragments) -> [n_fragments, seq_len, 3]``
probabilities, functions/token_classifier). The deterministic surrogate
(HashTokenClassifier) fills them for tests and benchmarks, matching the
reference demo, whose repo also ships no weights (SURVEY.md §2.9).

This module fills the SAME seats with a real
``AutoModelForTokenClassification`` checkpoint when the ``transformers``
package and weights are present — the reference's actual model path
(`mentions_detection.py:185-241` drives a BERT token classifier the
same way). The sandbox this engine is developed in ships neither
``transformers`` nor torch, so:

- every transformers import is lazy and produces a clear ImportError
  naming the missing dependency (never a stub result);
- the (tokenizer, model) loader is INJECTABLE — tests exercise the full
  fragment -> ids -> logits -> probs -> IOB-decode plumbing with a
  deterministic fake, so the adapter's Spark-side behavior (pickling
  across executors, per-worker lazy load, padding/special-token
  masking) is verified even though no real checkpoint can load here.

Executor lifecycle: the adapter pickles WITHOUT its loaded model (the
weights reload lazily per python worker on first predict) — the
iterator-of-batches pattern the NER UDF already uses means one load per
worker process, not per batch.
"""

from __future__ import annotations

import numpy as np


def transformers_available() -> bool:
    try:
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


def _default_loader(model_name: str):
    try:
        from transformers import (
            AutoModelForTokenClassification,
            AutoTokenizer,
        )
    except ImportError as e:
        raise ImportError(
            "the transformers package is not installed in this "
            "environment; HFTokenClassifier needs `pip install "
            "transformers torch` plus the checkpoint "
            f"{model_name!r} to run with real weights. For a "
            "deterministic no-dependency classifier use "
            "functions.token_classifier.HashTokenClassifier (the "
            "same seat)."
        ) from e
    tok = AutoTokenizer.from_pretrained(model_name)
    model = AutoModelForTokenClassification.from_pretrained(model_name)
    model.eval()
    return tok, model


class HFTokenClassifier:
    """Classifier seat backed by a HuggingFace token-classification
    checkpoint.

    ``label_map`` maps the model's label names (its config.id2label
    values) onto the engine's 3-way IOB layout — token_classifier.LABELS
    is ``("B", "I", "O")``, so B-slots map to 0, I to 1, O to 2 — for
    ONE entity type, e.g. ``{"B-DISEASE": 0, "I-DISEASE": 1, "O": 2}``;
    model labels not in the map contribute to O (the multi-type
    composition runs one provider per type —
    operators/ner.MultiTypeMentionProvider — exactly as the reference
    loops entity types).

    ``loader(model_name) -> (tokenizer, model)`` is injectable; the
    default imports transformers lazily.
    """

    def __init__(
        self,
        model_name: str,
        label_map: dict[str, int],
        loader=None,
    ) -> None:
        if sorted(set(label_map.values())) != [0, 1, 2]:
            raise ValueError(
                "label_map must cover exactly the 3-way engine layout "
                "{B-*: 0, I-*: 1, O: 2} (token_classifier.LABELS order)"
            )
        self.model_name = model_name
        self.label_map = dict(label_map)
        self._loader = loader
        self._tok = None
        self._model = None

    # -- executor lifecycle: pickle the config, never the weights ------
    def __getstate__(self):
        return {
            "model_name": self.model_name,
            "label_map": self.label_map,
            "_loader": self._loader,
        }

    def __setstate__(self, state):
        self.model_name = state["model_name"]
        self.label_map = state["label_map"]
        self._loader = state.get("_loader")
        self._tok = None
        self._model = None

    def _ensure_loaded(self):
        if self._model is None:
            loader = self._loader or _default_loader
            self._tok, self._model = loader(self.model_name)
        return self._tok, self._model

    def subtokenizer(self):
        """word -> word-piece strings, for fragment_document — the HF
        tokenizer filling the engine's subtokenizer seat so fragments
        carry the EXACT pieces the model was trained on."""
        tok, _ = self._ensure_loaded()

        def sub(word: str) -> list[str]:
            pieces = tok.tokenize(word)
            return pieces if pieces else [word]

        return sub

    def predict(self, fragments) -> np.ndarray:
        """[n_fragments, seq_len, 3] probabilities in the engine's
        layout. Special/pad positions (word_id == -1) get the uniform
        distribution, exactly like the surrogate classifier — they are
        masked by the word converters downstream."""
        if not fragments:
            return np.full((0, 0, 3), 1 / 3)
        tok, model = self._ensure_loaded()
        seq_len = len(fragments[0].subtokens)
        out = np.full(
            (len(fragments), seq_len, 3), 1 / 3, dtype=np.float64
        )

        # one forward per fragment batch: ids + attention over real pieces
        ids = np.array(
            [
                tok.convert_tokens_to_ids(
                    [
                        p if wid >= 0 else tok.pad_token
                        for p, wid in zip(f.subtokens, f.word_ids)
                    ]
                )
                for f in fragments
            ]
        )
        mask = np.array(
            [[1 if wid >= 0 else 0 for wid in f.word_ids] for f in fragments]
        )
        logits = _forward_logits(model, ids, mask)  # [n, seq, n_labels]

        # model label space -> engine 3-way layout LABELS=("B","I","O")
        # (unmapped labels — other entity types of a multi-type
        # checkpoint — fold into O, engine index 2)
        id2label = _id2label(model)
        exp = np.exp(logits - logits.max(axis=-1, keepdims=True))
        probs = exp / exp.sum(axis=-1, keepdims=True)
        folded = np.zeros((len(fragments), seq_len, 3), dtype=np.float64)
        for model_id, name in id2label.items():
            folded[..., self.label_map.get(name, 2)] += probs[..., model_id]
        for fi, f in enumerate(fragments):
            for pos, wid in enumerate(f.word_ids):
                if wid >= 0:
                    out[fi, pos] = folded[fi, pos]
        return out


def _forward_logits(model, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Run the model; torch tensors only exist inside this function so a
    fake model (tests) can accept/return plain numpy."""
    res = model(input_ids=ids, attention_mask=mask)
    logits = res["logits"] if isinstance(res, dict) else res.logits
    if hasattr(logits, "detach"):  # torch tensor
        logits = logits.detach().cpu().numpy()
    return np.asarray(logits, dtype=np.float64)


def _id2label(model) -> dict[int, str]:
    cfg = getattr(model, "config", None)
    id2label = getattr(cfg, "id2label", None)
    if id2label is None:
        raise ValueError(
            "model has no config.id2label — cannot map its label space "
            "onto the engine's 3-way IOB layout"
        )
    return {int(k): str(v) for k, v in dict(id2label).items()}
