"""F1 offset tokenization: property tests + byte-parity against the
reference's own ``word_start_end`` (loaded from /root/reference when
present — SURVEY.md §5 test pyramid (a))."""

from __future__ import annotations

import importlib.util
import os
import random
import string
import unicodedata

import pytest

from ner_linking_demo_spark.functions.tokenization import (
    is_control,
    is_space,
    words_with_offsets,
)

REF_PREPROCESS = "/root/reference/server/ner/src/utils/ner/pre_process.py"


def _random_texts(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    alphabet = (
        string.ascii_letters
        + string.digits
        + "áéíóúñüÁÉÑ"
        + " \t\n\r"
        + ".,;:!?()[]{}-_«»"
        + "\x00\x01\x07�"
        + "漢字日本"
        + "  "  # unicode Zs spaces
    )
    out = []
    for _ in range(n):
        out.append(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200)))
        )
    out += ["", " ", "\x00", "a\x01b c", "á.ñ", "末端 test"]
    return out


@pytest.fixture(scope="module")
def ref_word_start_end():
    if not os.path.exists(REF_PREPROCESS):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_pre", REF_PREPROCESS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.word_start_end


@pytest.mark.parametrize("cased", [True, False])
def test_parity_with_reference(ref_word_start_end, cased):
    for text in _random_texts(200):
        ours = words_with_offsets(text, cased=cased)
        ref_words, ref_offsets = ref_word_start_end(text, cased=cased)
        assert [w for w, _, _ in ours] == ref_words, repr(text)
        assert [(s, e) for _, s, e in ours] == ref_offsets, repr(text)


def test_offsets_slice_back(clinical_case):
    for word, start, end in words_with_offsets(clinical_case):
        sliced = clinical_case[start:end]
        # the slice may contain dropped control chars; removing them must
        # reproduce the word
        clean = "".join(
            ch
            for ch in sliced
            if not (ord(ch) in (0, 0xFFFD) or is_control(ch) or is_space(ch))
        )
        assert clean == word or sliced == word


def test_char_count_invariant():
    # mirrors the reference's internal assert (pre_process.py:92-93)
    for text in _random_texts(100, seed=11):
        words = words_with_offsets(text)
        n_word_chars = sum(len(w) for w, _, _ in words)
        n_kept = sum(
            1
            for ch in text
            if not (
                is_space(ch) or ord(ch) in (0, 0xFFFD) or is_control(ch)
            )
        )
        assert n_word_chars == n_kept


def test_start_i_shift():
    base = words_with_offsets("hola mundo")
    shifted = words_with_offsets("hola mundo", start_i=10)
    assert [(s + 10, e + 10) for _, s, e in base] == [
        (s, e) for _, s, e in shifted
    ]


def test_uncased_transform():
    words = words_with_offsets("Árbol NIÑO", cased=False)
    assert [w for w, _, _ in words] == ["arbol", "nino"]
    assert unicodedata.category(" ") == "Zs"
