"""J8: parent-code expansion over a code hierarchy (reference
`/root/reference/server/linking/src/utils/triplet_generation.py:71-96`,
``get_parent_codes_dict``): for each corpus code, collect its parent
codes from the vocabulary plus the synonym strings of those parents and
of the code itself. Training-only in the reference (positive-pair
generation); generically useful in a KG engine for hierarchy-aware
canonicalization and rollups, so covered here.

Differences from the reference, documented:
- the reference returns lists ordered by vocab row order; this operator
  canonicalizes with ``sort_array`` (deterministic under any partitioning
  — order-sensitive output would depend on shuffle order);
- codes missing from the vocabulary are DROPPED and *counted* (the
  reference increments ``codigos_not_found``): the count is exposed as a
  second return value, not silently lost.

Scale posture: the vocabulary is a dimension table — every join here is
broadcast; the only corpus-scale relation is ``codes_df`` itself, touched
by exactly one broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_parent_codes(
    codes_df: DataFrame, vocab_df: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """codes_df(code) x vocab_df(code, term, parents array<string>) ->
    (expanded, not_found).

    expanded: (code, parent_codes array<string>, strings array<string>)
    where strings = sorted distinct terms of the parent codes plus the
    code's own terms; not_found: (code) rows absent from the vocabulary
    (the reference's ``codigos_not_found`` counter, kept as data)."""
    parents = vocab_df.select(
        "code", F.explode_outer("parents").alias("parent")
    )
    parent_terms = parents.join(
        F.broadcast(
            vocab_df.select(
                F.col("code").alias("parent"), F.col("term").alias("pterm")
            )
        ),
        "parent",
        "left",
    )
    own_terms = vocab_df.groupBy("code").agg(
        F.collect_set("term").alias("own_strings")
    )
    per_code = (
        parent_terms.groupBy("code")
        .agg(
            F.sort_array(
                F.filter(F.collect_set("parent"), lambda p: p.isNotNull())
            ).alias("parent_codes"),
            F.filter(F.collect_set("pterm"), lambda t: t.isNotNull()).alias(
                "pstrings"
            ),
        )
        .join(F.broadcast(own_terms), "code")
        .select(
            "code",
            "parent_codes",
            F.sort_array(
                F.array_distinct(F.concat("pstrings", "own_strings"))
            ).alias("strings"),
        )
    )
    distinct_codes = codes_df.select("code").dropDuplicates()
    expanded = distinct_codes.join(F.broadcast(per_code), "code")
    not_found = distinct_codes.join(
        F.broadcast(vocab_df.select("code").dropDuplicates()),
        "code",
        "left_anti",
    )
    return expanded, not_found
