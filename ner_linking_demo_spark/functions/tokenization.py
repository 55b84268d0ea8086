"""Offset-preserving word tokenization (reference semantics F1).

Reimplements — from its observable behavior, not its code — the
whitespace/punctuation pre-tokenization of the reference
(`/root/reference/server/ner/src/utils/ner/pre_process.py:23-103`,
``word_start_end``), which itself follows BERT-style pre-tokenization:

- every punctuation character (ASCII punct ranges or Unicode category ``P*``)
  and every CJK ideograph is a standalone one-character word;
- whitespace (space/tab/CR/LF or Unicode ``Zs``) separates words and is
  never part of a word;
- NUL, U+FFFD and control characters (Unicode ``C*``) are *dropped from the
  word text but still advance the character offset* — so a word may span a
  control char and its ``text[start:end]`` slice then contains it;
- char offsets are Python code-point offsets into the (possibly
  NFD-uncased-transformed) input; ``end`` is exclusive.

This function is the single source of truth for offsets in the whole
engine: the NER stage, the dictionary-matcher surrogate model, and the
pandas oracle all import it, so offset fidelity (the byte-identical-text
invariant's sibling) is structural. It is pure Python by design: it runs
only *inside* Arrow-batched pandas UDFs at per-document granularity — the
same granularity at which the reference runs it — never per-row from the
driver.

Invariant (mirrors the reference's internal assert at
``pre_process.py:92-93``): the total number of word characters equals the
number of non-dropped, non-space characters consumed.
"""

from __future__ import annotations

import unicodedata

_ASCII_PUNCT = frozenset(
    [c for c in range(33, 48)]
    + [c for c in range(58, 65)]
    + [c for c in range(91, 97)]
    + [c for c in range(123, 127)]
)

_CJK_RANGES = (
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF),
    (0x2F800, 0x2FA1F),
)

_SPACE_CHARS = frozenset(" \n\r\t")


def is_punctuation(ch: str) -> bool:
    return ord(ch) in _ASCII_PUNCT or unicodedata.category(ch).startswith("P")


def is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def is_space(ch: str) -> bool:
    return ch in _SPACE_CHARS or unicodedata.category(ch) == "Zs"


def is_control(ch: str) -> bool:
    return unicodedata.category(ch).startswith("C")


# Hot-path classification cache: WORD / PUNCT / SPACE / DROP, precomputed
# for the Latin-1 range (the overwhelmingly common case in the NER UDF's
# per-character loop) and memoized for everything else. Pure lookup of the
# same predicates above — semantics identical (hypothesis-fuzzed against
# the reference implementation).
_WORD, _PUNCT, _SPACE, _DROP = 0, 1, 2, 3


def _classify(ch: str) -> int:
    if is_punctuation(ch) or is_cjk(ch):
        return _PUNCT
    if is_space(ch):
        return _SPACE
    if ord(ch) == 0 or ord(ch) == 0xFFFD or is_control(ch):
        return _DROP
    return _WORD


_LATIN1_CLASS = [_classify(chr(cp)) for cp in range(256)]
_CLASS_CACHE: dict[str, int] = {}

# ASCII fast path (round-6): for ASCII text with no DROP-class bytes
# (NUL / control chars other than \t\n\r never appear in curated
# corpora),
# the per-character classification collapses to "alnum runs are words,
# every other non-space printable is a one-char punct token" — exactly
# one C-level regex scan instead of a per-character python loop.
# Bit-identical to the slow path on eligible text (property-fuzzed in
# tests/test_tokenization_hypothesis.py, which generates both ASCII and
# non-ASCII inputs); anything non-ASCII or carrying control bytes takes
# the original loop.
import re as _re

_ASCII_TOKEN_RE = _re.compile(r"[0-9A-Za-z]+|[^\s0-9A-Za-z]")
_ASCII_UNSAFE_RE = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def _ascii_fast_eligible(text: str) -> bool:
    return text.isascii() and _ASCII_UNSAFE_RE.search(text) is None


def uncase(text: str) -> str:
    """NFD-normalize, strip combining marks, lowercase (reference
    ``cased=False`` path, ``pre_process.py:74-77``). Note this changes
    string length, so offsets refer to the transformed text."""
    decomposed = unicodedata.normalize("NFD", text)
    stripped = "".join(
        ch for ch in decomposed if unicodedata.category(ch) != "Mn"
    )
    return stripped.lower()


def words_with_offsets(
    text: str, start_i: int = 0, cased: bool = True
) -> list[tuple[str, int, int]]:
    """Tokenize ``text`` into ``(word, start, end)`` triples.

    ``start``/``end`` are code-point offsets (end exclusive) relative to
    ``start_i``. Semantics match the reference ``word_start_end`` exactly
    (verified by property tests in tests/test_tokenization.py).
    """
    if not cased:
        text = uncase(text)

    if _ascii_fast_eligible(text):
        if start_i == 0:
            return [
                (m.group(), m.start(), m.end())
                for m in _ASCII_TOKEN_RE.finditer(text)
            ]
        return [
            (m.group(), m.start() + start_i, m.end() + start_i)
            for m in _ASCII_TOKEN_RE.finditer(text)
        ]

    out: list[tuple[str, int, int]] = []
    buf: list[str] = []
    buf_start = -1
    buf_last = -1
    pos = start_i

    def flush() -> None:
        nonlocal buf, buf_start, buf_last
        if buf:
            out.append(("".join(buf), buf_start, buf_last + 1))
            buf = []
            buf_start = -1
            buf_last = -1

    latin1 = _LATIN1_CLASS
    cache = _CLASS_CACHE
    for ch in text:
        cp = ord(ch)
        if cp < 256:
            cls = latin1[cp]
        else:
            cls = cache.get(ch)
            if cls is None:
                cls = _classify(ch)
                cache[ch] = cls
        if cls == _WORD:
            if not buf:
                buf_start = pos
            buf.append(ch)
            buf_last = pos
        elif cls == _SPACE:
            flush()
        elif cls == _PUNCT:
            flush()
            out.append((ch, pos, pos + 1))
        # else _DROP: NUL / U+FFFD / control — offset still advances and
        # the current word is NOT broken.
        pos += 1
    flush()
    return out
