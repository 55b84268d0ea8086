"""Exact substring deduplication (the ExactSubstr family of Lee et al.
2022, "Deduplicating Training Data Makes Language Models Better").

The one dedup family the engine lacked (round-4 verdict item 3):
MinHash/SimHash catch whole-document near-dups and dedup_lines catches
line boilerplate, but the verbatim 50-token runs that web corpora
repeat across otherwise-different documents need substring-grain
detection. Lee et al. build a suffix array over the concatenated
corpus; a suffix array is a single shared mutable structure with no
honest distributed equivalent, so this is the Spark-first restatement
with the same detection semantics at token grain:

1. every ``n_gram``-token window of every document becomes an
   (id, pos, md5(gram)) row — computed INSIDE the scan projection
   (split + transform + md5, pure codegen: the text column itself
   never shuffles, only the fixed-width gram rows do);
2. first occurrence per (id, gram) — bounds anchors to one per
   (document pair, gram), so a degenerate internally-repetitive doc
   cannot blow the join up quadratically;
3. document-frequency pruning — grams shared by more than ``max_df``
   docs are boilerplate the pairwise join must not expand (same
   df-pruning rationale as winnow_containment_pairs);
4. equi-join on the gram hash (id_a < id_b) -> anchors;
5. gaps-and-islands per (pair, diagonal): anchors of one duplicated
   run sit at consecutive positions on the SAME diagonal
   (pos_a - pos_b constant); runs chain with a window lag + cumsum,
   and each island becomes a maximal duplicated extent.

In exact mode (``sample_mod=None``) this finds every cross-document
duplicated run of >= ``min_tokens`` whitespace tokens whose grams
survive df-pruning (see :func:`exact_substring_pairs` for the precise
contract — runs duplicated across more than ``max_df`` documents are
corpus boilerplate and belong to dedup_lines / MinHash-LSH, which are
linear in document frequency where a pairwise join is quadratic), with
exact maximal extents at token granularity. Within-document repetition is out of scope by
design (the Gopher repetition gate, functions/text_analysis.py, owns
that signal).

Scale posture (100 TB): gram rows are corpus-token-scale — the same
order of work as the suffix array Lee et al. build, but embarrassingly
partitioned. Exchanges carry only (id, pos, 16-byte hash) rows; text
stays in the scan. ``sample_mod=p`` switches to content-defined
sampling (keep grams whose hash ≡ 0 mod p): selection is a pure
function of the gram text, so duplicated runs still select IDENTICAL
gram sets in every copy — detection of a run of t tokens then succeeds
iff the run contains a selected gram (expected t/p selected; misses
are possible, and extents only chain while anchor windows still
overlap — they under-cover, never over-cover), at 1/p the shuffle
volume. Exact mode is the oracle-checked default; sampled mode is the
documented scale knob.

Everything is deterministic, engine-independent SQL. Exact mode keys
grams by ``xxhash64`` of the token slice (round-6: 8 bytes, no
joined-string allocation; ``h`` is only ever an equality key, so the
reported extents are identical to the md5 form) while sampled mode
keeps md5 of the space-joined gram — the content-defined selection
contract is defined on that digest. The driver entry
`dedup_exact_substring` checks the whole chain against a declarative
DuckDB oracle that re-derives the extents from the text (the oracle's
own gram key stays md5; extents are hash-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _gram_rows(
    docs: DataFrame,
    n_gram: int,
    id_col: str,
    text_col: str,
    sample_mod: int | None,
) -> DataFrame:
    """Raw (id, pos, h) gram-occurrence rows (pre-dedup), computed
    entirely inside the scan projection. In exact mode ``h`` is
    ``xxhash64`` of the token slice (8 bytes — no joined-string
    allocation, ~4x cheaper per gram and ~2x narrower shuffle rows than
    the md5-hex form; ``h`` is only ever an equality key, so the final
    extents are identical). In sampled mode ``h`` stays md5 of the
    space-joined gram: the documented selection contract (keep grams
    with md5-prefix ≡ 0 mod p) is a pure function of the gram TEXT and
    must not change with the key encoding."""
    if n_gram < 1:
        raise ValueError("n_gram must be >= 1")
    # Materialize the token array in its OWN projection and reference it
    # as a column inside the gram lambda. Building the split inline
    # (the pre-round-6 form) re-evaluated split(trim(text)) for EVERY
    # gram position — non-lambda subexpressions inside a higher-order
    # function's lambda are re-evaluated per element and never CSE'd —
    # an O(tokens^2) regex pathology that dominated this operator
    # (measured 20.4s of a 23s run at sf1.0 for the gram pass alone).
    # The multiple references below (size() twice + the lambda) also
    # stop CollapseProject from inlining the split back in.
    toked = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks"),
    )
    toks = F.col("_toks")
    # sequence() auto-steps -1 when start > stop: guard short docs
    idx = F.when(
        F.size(toks) >= n_gram,
        F.sequence(F.lit(0), F.size(toks) - n_gram),
    ).otherwise(F.array().cast("array<int>"))
    if sample_mod is None:
        hash_of = lambda i: F.xxhash64(F.slice(toks, i + 1, n_gram))  # noqa: E731
    else:
        if sample_mod < 1:
            raise ValueError("sample_mod must be >= 1")
        hash_of = lambda i: F.md5(  # noqa: E731
            F.array_join(F.slice(toks, i + 1, n_gram), " ")
        )
    grams = toked.select(
        "id",
        F.posexplode(F.transform(idx, hash_of)).alias("pos", "h"),
    )
    if sample_mod is not None:
        grams = grams.filter(
            F.conv(F.substring("h", 1, 8), 16, 10).cast("long")
            % sample_mod
            == 0
        )
    return grams


def token_gram_occurrences(
    docs: DataFrame,
    n_gram: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_mod: int | None = None,
) -> DataFrame:
    """(id, pos, h): the FIRST occurrence position of every distinct
    ``n_gram``-token window per document; ``h`` = xxhash64 of the token
    slice (exact mode) or md5 of the space-joined gram (sampled mode —
    see :func:`_gram_rows`; either way ``h`` is pure equality key).
    Tokenization is the engine-wide Spark split on java ``\\s+``
    (decontamination parity rule: one tokenization expression for every
    physical form). Documents shorter than ``n_gram`` tokens emit
    nothing; NULL text emits nothing."""
    grams = _gram_rows(docs, n_gram, id_col, text_col, sample_mod)
    return grams.groupBy("id", "h").agg(F.min("pos").alias("pos"))


def exact_substring_pairs(
    docs: DataFrame,
    min_tokens: int = 50,
    n_gram: int = 16,
    max_df: int | None = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_mod: int | None = None,
    max_gap: int | None = None,
    materialize_occurrences: bool = True,
) -> DataFrame:
    """Maximal cross-document duplicated token runs:
    (id_a, id_b, begin_a, begin_b, n_tokens), id_a < id_b, one row per
    maximal extent of >= ``min_tokens`` tokens duplicated verbatim
    between the two documents (positions are 0-based token offsets;
    the extent covers tokens [begin, begin + n_tokens)).

    Extent coverage invariant (what makes removal safe): an extent is
    exactly the union of its anchors' verbatim-shared gram windows, so
    EVERY token inside a reported extent is verbatim duplicated between
    the two documents. Anchors chain when their windows can still
    overlap — the effective chain gap is ``min(max_gap, n_gram)`` — so
    no extent ever bridges an unverified region (a bridged gap > n_gram
    would claim tokens no anchor covers). ``max_gap`` defaults to 1 in
    exact mode (consecutive grams of a contiguous run are exactly 1
    apart, so chains break exactly where the duplication breaks) and to
    ``n_gram`` in sampled mode.

    Detection contract, stated precisely:

    - EXACT mode (``sample_mod=None``) finds every cross-document
      duplicated run of >= ``min_tokens`` tokens **whose grams survive
      df-pruning**: grams shared by more than ``max_df`` documents are
      dropped before the pairwise join (a verbatim run duplicated
      across thousands of documents would otherwise expand into
      O(df^2) anchor pairs per gram — that corpus-boilerplate regime
      belongs to dedup_lines / MinHash-LSH, which are linear in df).
      A pruned gram INSIDE a two-doc run splits its extent; each
      fragment must independently clear ``min_tokens``. Pass
      ``max_df=None`` to disable the ceiling on corpora small enough
      to afford the quadratic expansion.
    - SAMPLED mode (``sample_mod=p``) keeps only grams with
      hash ≡ 0 mod p: detection of a run requires it to contain a
      selected gram, and extents under-cover run edges/interiors where
      no gram was selected (they never over-cover — see the invariant
      above). Keep ``sample_mod`` well under ``n_gram`` (expected
      selection gap ~p must fit inside the window-overlap chain
      tolerance) or long runs fragment below ``min_tokens``.

    First-occurrence caveat (documented, deterministic): anchors use
    each gram's first position per document, so a run whose gram also
    occurs EARLIER in the document anchors off-diagonal and the extent
    fragments at that gram. With 16-token grams that requires verbatim
    16-token repetition before the run — rare outside the degenerate
    spam the repetition gate already drops.

    ``materialize_occurrences`` is retained for API compatibility and
    ignored: the occurrence set now has exactly ONE consumer (the
    single-pass plan below), so there is nothing to materialize.
    """
    if min_tokens < n_gram:
        raise ValueError(
            f"min_tokens ({min_tokens}) must be >= n_gram ({n_gram}): "
            "shorter runs carry no complete gram"
        )
    if max_gap is None:
        max_gap = 1 if sample_mod is None else n_gram
    # window-overlap clamp: chaining past n_gram would bridge tokens no
    # anchor verifies (the round-5 review's sampled-mode over-merge)
    max_gap = min(max_gap, n_gram)

    # Single-pass plan (round-6 optimization; guide §2.4 "remove
    # shuffles outright"): hash-cluster the raw gram rows by h ONCE,
    # then first-occurrence dedup, df-pruning and anchor-pair
    # generation all run IN PLACE on that one partitioning —
    # HashPartitioning(h) satisfies the clustering requirement of every
    # downstream groupBy/window whose keys contain h, so Catalyst
    # inserts no further exchange. The previous form paid two full
    # gram-hashing passes (counts + the checkpointed join input) and
    # four exchanges; this one pays ONE pass and ONE gram-row exchange
    # (plus the dup-pair-scale islands window). repartition carries no
    # explicit partition count, so AQE sizes/coalesces it from the data
    # (scale-adaptive, not tuned to local[32]).
    grams = _gram_rows(docs, n_gram, id_col, text_col, sample_mod)
    occ = (
        grams.repartition(F.col("h"))
        .groupBy("h", "id")
        .agg(F.min("pos").alias("pos"))
    )
    # df-pruning: only grams shared by 2..max_df docs can anchor a
    # pair; hotter grams are boilerplate (quadratic join risk). The
    # per-gram doc count is a window over the SAME h clustering —
    # streaming count, never a collected list, so an over-max_df
    # boilerplate gram costs a counter, not memory.
    occ = occ.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
    ).filter(F.col("df") >= 2)
    if max_df is not None:
        occ = occ.filter(F.col("df") <= F.lit(max_df))
        # anchor pairs per surviving gram, generated in place: collect
        # the (<= max_df, bounded) occurrence structs per gram and
        # explode both sides — no join, no further exchange.
        lists = occ.groupBy("h").agg(
            F.collect_list(F.struct("id", "pos")).alias("occs")
        )
        anchors = (
            lists.select(F.col("occs"), F.explode("occs").alias("a"))
            .select("a", F.explode("occs").alias("b"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                (F.col("a.pos") - F.col("b.pos")).alias("diag"),
                F.col("a.pos").alias("pos_a"),
            )
        )
    else:
        # max_df=None (documented small-corpus-only escape hatch): a
        # gram's occurrence list is unbounded, and buffering it into
        # one collect_list row would put an O(df) array in a single
        # aggregation buffer (round-6 review). Stream the quadratic
        # expansion through an equi-join instead — both sides are the
        # SAME h-clustered subtree, so the join needs no new exchange;
        # the subtree computes twice, the price the pre-round-6 form
        # paid everywhere.
        a = occ.select(
            F.col("id").alias("id_a"), "h", F.col("pos").alias("pos_a")
        )
        b = occ.select(
            F.col("id").alias("id_b"), "h", F.col("pos").alias("pos_b")
        )
        anchors = (
            a.join(b, "h")
            .filter(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                (F.col("pos_a") - F.col("pos_b")).alias("diag"),
                "pos_a",
            )
        )

    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    flagged = anchors.withColumn(
        "_new",
        F.when(
            F.col("pos_a") - F.lag("pos_a").over(w) <= max_gap, 0
        ).otherwise(1),  # first row in a partition: lag NULL -> 1
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    extents = (
        flagged.groupBy("id_a", "id_b", "diag", "_island")
        .agg(
            F.min("pos_a").alias("begin_a"),
            (F.max("pos_a") + F.lit(n_gram)).alias("_end_a"),
        )
        .select(
            "id_a",
            "id_b",
            "begin_a",
            (F.col("begin_a") - F.col("diag")).alias("begin_b"),
            (F.col("_end_a") - F.col("begin_a")).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") >= min_tokens)
    )
    return extents


def remove_duplicate_spans(
    docs: DataFrame,
    extents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_empty: bool = True,
) -> DataFrame:
    """Lee et al.'s removal step: cut every duplicated extent from the
    HIGHER-id document of each pair (the lower id keeps its copy —
    exactly one survivor per duplicated run, deterministic under any
    execution order). Token-grain splice, pure codegen: tokens whose
    0-based index falls inside any removed extent are filtered out of
    the split array and the text is re-joined single-spaced (the
    engine's document normal form). Documents this pass spliced down to
    no tokens are dropped when ``drop_empty`` (dedup_lines' hollow-drop
    rule — and exactly like dedup_lines, docs that were ALREADY
    empty/NULL and were never cut pass through untouched). Safe to feed
    from either detection mode: exact_substring_pairs' coverage
    invariant guarantees every token inside an extent is verbatim
    duplicated, so removal can never delete unique content.

    One exchange: extents aggregate per victim id (dup-pair-scale, not
    corpus-scale), then join the docs scan; non-victim docs pass
    through untouched via the left join.

    KNOWN INTERACTION (round-6 advice, documented by design): the
    splice re-joins the victim's surviving tokens SINGLE-SPACED — the
    engine's document normal form — which collapses newlines. A spliced
    victim therefore reads as one line to any later line-grain signal:
    in ``run_corpus_pipeline`` the Gopher repetition gate runs after
    substring dedup, so ``dup_line_frac``/``dup_line_char_frac`` are
    trivially ~0 for exactly the partially-duplicated docs. This is
    accepted rather than fixed because (a) every other token-grain
    signal (top/dup n-gram fractions — the signals that actually catch
    the residual repetition a splice leaves) is whitespace-insensitive,
    and (b) a structure-preserving splice would break the
    token-offset contract the extents are expressed in. Pipelines that
    depend on line-duplication gating should order ``line_dedup``
    BEFORE ``substring_dedup`` (run_corpus_pipeline already does).
    """
    victim_spans = (
        extents.select(
            F.col("id_b").alias("id"),
            F.struct(
                F.col("begin_b").alias("begin"),
                (F.col("begin_b") + F.col("n_tokens")).alias("end"),
            ).alias("span"),
        )
        .groupBy("id")
        .agg(F.collect_list("span").alias("_cut"))
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    spliced = F.array_join(
        F.filter(
            toks,
            lambda t, i: ~F.exists(
                F.col("_cut"),
                lambda s: (i >= s["begin"]) & (i < s["end"]),
            ),
        ),
        " ",
    )
    out = docs.join(
        victim_spans, docs[id_col] == victim_spans["id"], "left"
    ).select(
        *[
            F.when(F.col("_cut").isNotNull(), spliced)
            .otherwise(F.col(c))
            .alias(c)
            if c == text_col
            else docs[c]
            for c in docs.columns
        ],
        F.col("_cut").isNotNull().alias("_was_cut"),
    )
    if drop_empty:
        # hollow-drop applies ONLY to docs this pass actually spliced:
        # a non-victim doc with NULL/blank text passes through untouched
        # (the round-5 review caught the unconditional filter silently
        # deleting such docs — dedup must never drop what it never cut)
        out = out.filter(
            ~F.col("_was_cut")
            | (F.length(F.trim(F.col(text_col))) > 0)
        )
    return out.drop("_was_cut")
