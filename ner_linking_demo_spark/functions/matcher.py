"""Deterministic surrogate NER: gazetteer dictionary matcher.

The reference's NER is a TF RoBERTa token classifier whose weights are
missing from the repo (`/root/reference/server/ner/models/model_checkpoints/
README.md:1`), so tests define NER against a deterministic surrogate
(SURVEY.md §2.9 note). This matcher reproduces everything *around* the
model exactly — the offset tokenization (functions/tokenization.py), the
continuous-span/char-offset output contract of the IOB decode
(`post_process.py:449-490`), and the ``span == text[start:end]`` slice
invariant (`post_process.py:887-894`) — replacing only the classifier with
longest-match dictionary lookup over the gazetteer surface forms.

Matching rule (deterministic, shared by engine and oracle):
- tokenize the document with ``words_with_offsets`` (cased=True, the demo
  path: `mentions_detection.py` uses cased models);
- a gazetteer term matches words[i:i+n] when the term's own token sequence
  equals the document's token sequence case-insensitively (casefold);
- longest match wins; scanning is left-to-right, non-overlapping *within*
  an entity type; entity types are matched independently (the reference
  runs one model per entity type: `mentions_detection.py:216-241`), so
  cross-type overlaps are allowed;
- emitted mention: (label, start=words[i].start, end=words[i+n-1].end,
  span=text[start:end]) — the span is sliced from the ORIGINAL text, so it
  may contain the original whitespace/control bytes between words.

The matcher state is a small dict built once from the gazetteer dimension
table and broadcast; matching runs inside Arrow-batched pandas UDFs at
per-document granularity.
"""

from __future__ import annotations

from .tokenization import _ascii_fast_eligible, words_with_offsets

Mention = tuple[str, int, int, str]  # (label, start, end, span)


def term_key(term: str) -> tuple[str, ...]:
    """Canonical match key for a surface form: its casefolded token tuple."""
    return tuple(w.casefold() for w, _, _ in words_with_offsets(term))


class DictionaryMatcher:
    """label -> {token-tuple} matcher with longest-match-first scanning."""

    def __init__(self, terms_by_label: dict[str, list[str]]):
        self.tries: dict[str, dict[tuple[str, ...], bool]] = {}
        self.max_len: dict[str, int] = {}
        # first-token gate: scanning positions whose word can't start any
        # term skip with one set lookup (the overwhelmingly common case)
        self.first_tokens: dict[str, set[str]] = {}
        for label, terms in terms_by_label.items():
            keys = {term_key(t) for t in terms}
            keys.discard(())
            self.tries[label] = dict.fromkeys(keys, True)
            self.max_len[label] = max((len(k) for k in keys), default=0)
            self.first_tokens[label] = {k[0] for k in keys}

    def find_mentions(self, text: str) -> list[Mention]:
        words = words_with_offsets(text)
        if _ascii_fast_eligible(text):
            # ASCII: casefold == lower and lower() is length-preserving,
            # so one C-level lower of the whole text + offset slicing
            # replaces a per-word casefold call (round-6; identical
            # lowered tokens by construction). A compiled-alternation
            # regex scan was also tried here and measured SLOWER than
            # this first-token-gated loop (python re tries every
            # alternative per position) — see OPTIMIZATION_r06.md.
            lt = text.lower()
            lowered = [lt[s:e] for _, s, e in words]
        else:
            lowered = [w.casefold() for w, _, _ in words]
        out: list[Mention] = []
        for label in sorted(self.tries):
            table = self.tries[label]
            max_n = self.max_len[label]
            firsts = self.first_tokens[label]
            i = 0
            n_words = len(words)
            while i < n_words:
                if lowered[i] not in firsts:
                    i += 1
                    continue
                matched = 0
                for n in range(min(max_n, n_words - i), 0, -1):
                    if tuple(lowered[i : i + n]) in table:
                        matched = n
                        break
                if matched:
                    start = words[i][1]
                    end = words[i + matched - 1][2]
                    out.append((label, start, end, text[start:end]))
                    i += matched
                else:
                    i += 1
        # Reference output ordering: sort by (start, end, label)
        # (`mentions_detection.py:283-285`); uniqueness on the triple is
        # asserted there (:286) and is structural here (non-overlap per label).
        out.sort(key=lambda m: (m[1], m[2], m[0]))
        return out
