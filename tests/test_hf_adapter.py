"""HF model-seat adapter: the full fragment -> ids -> logits -> probs ->
IOB-decode plumbing with an injected deterministic fake (the sandbox has
no transformers/torch), plus the clean-failure path and executor
pickling lifecycle."""

from __future__ import annotations

import pickle

import numpy as np
import pytest

from ner_linking_demo_spark.functions.hf_adapter import (
    HFTokenClassifier,
    transformers_available,
)

# engine layout token_classifier.LABELS = ("B", "I", "O")
LABELS = {"B-ENT": 0, "I-ENT": 1, "O": 2}


class FakeTokenizer:
    """Word-piece-ish: lowercases; splits words longer than 4 chars into
    a head piece + '##'-suffixed tails (deterministic)."""

    pad_token = "[PAD]"

    def tokenize(self, word):
        w = word.lower()
        if len(w) <= 4:
            return [w]
        return [w[:4]] + ["##" + w[i : i + 4] for i in range(4, len(w), 4)]

    def convert_tokens_to_ids(self, tokens):
        # zlib.crc32, not hash(): the builtin is salted per process and
        # these ids must agree between a pickled clone and the original
        import zlib

        return [zlib.crc32(t.encode()) % 50000 for t in tokens]


class FakeConfig:
    # a multi-label checkpoint: the extra OTHER labels must fold into O
    id2label = {0: "O", 1: "B-ENT", 2: "I-ENT", 3: "B-OTHER", 4: "I-OTHER"}


class FakeModel:
    """Tags every piece of the word 'targetwo' as B-ENT and every piece
    of the word 'words' as I-ENT (whole words tagged consistently so the
    prob-product word converter is unambiguous) — deterministic logits,
    numpy in/out (the adapter keeps torch out of the interface so fakes
    are plain python)."""

    config = FakeConfig()

    def __init__(self, tokenizer):
        self.tok = tokenizer

    def __call__(self, input_ids, attention_mask):
        n, s = input_ids.shape
        logits = np.zeros((n, s, 5))
        b_ids = set(self.tok.convert_tokens_to_ids(["targ", "##etwo"]))
        i_ids = set(self.tok.convert_tokens_to_ids(["word", "##s"]))
        for i in range(n):
            for j in range(s):
                if input_ids[i, j] in b_ids:
                    logits[i, j, 1] = 8.0
                elif input_ids[i, j] in i_ids:
                    logits[i, j, 2] = 8.0
                else:
                    logits[i, j, 0] = 8.0
        return {"logits": logits}


def _fake_loader(model_name):
    tok = FakeTokenizer()
    return tok, FakeModel(tok)


def _adapter():
    return HFTokenClassifier(
        "fake/checkpoint", LABELS, loader=_fake_loader
    )


def test_sandbox_has_no_transformers_and_error_is_clean():
    assert transformers_available() is False
    clf = HFTokenClassifier("some/model", LABELS)  # default loader
    with pytest.raises(ImportError, match="transformers"):
        clf._ensure_loaded()


def test_label_map_validation():
    with pytest.raises(ValueError, match="3-way"):
        HFTokenClassifier("m", {"B-ENT": 0, "I-ENT": 1})


def test_full_chain_decodes_mentions_with_injected_model():
    from ner_linking_demo_spark.operators.ner import (
        TokenClassifierMentionProvider,
    )

    clf = _adapter()
    provider = TokenClassifierMentionProvider(
        classifier=clf,
        label="ENT",
        subtokenizer=clf.subtokenizer(),
    )
    text = "plain content then targetwo words appear and more text"
    mentions = provider.find_mentions(text)
    spans = [text[s:e] for (_, s, e, _) in mentions]
    assert spans == ["targetwo words"], mentions


def test_unmapped_labels_fold_into_O():
    clf = _adapter()
    from ner_linking_demo_spark.functions.fragments import (
        fragment_document,
    )

    frags = fragment_document(
        "plain content only here", seq_len=16,
        subtokenizer=clf.subtokenizer(),
    )
    probs = clf.predict(frags)
    assert probs.shape == (len(frags), 16, 3)
    # real positions: distribution sums to 1 and O dominates
    for fi, f in enumerate(frags):
        for pos, wid in enumerate(f.word_ids):
            assert probs[fi, pos].sum() == pytest.approx(1.0)
            if wid >= 0:
                assert probs[fi, pos, 2] > 0.9  # O = engine index 2


def test_pickle_drops_weights_and_reloads_lazily():
    clf = _adapter()
    clf._ensure_loaded()
    assert clf._model is not None
    clone = pickle.loads(pickle.dumps(clf))
    assert clone._model is None and clone._tok is None  # weights dropped
    # reloads on demand and produces identical output
    from ner_linking_demo_spark.functions.fragments import (
        fragment_document,
    )

    frags = fragment_document(
        "targetwo here", seq_len=8, subtokenizer=clf.subtokenizer()
    )
    assert np.allclose(clone.predict(frags), clf.predict(frags))


def test_empty_fragments():
    assert _adapter().predict([]).shape == (0, 0, 3)
