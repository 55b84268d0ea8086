"""Explicit skew salting (north_rule: "skew from hot entities and giant
pages is handled with explicit salting, AQE skew-join hints, and
repartition on url-hash").

AQE's skew-join splitting handles *join* skew at runtime; these helpers
handle the two places AQE can't:
- **aggregation skew**: a hot group key (a code like "diabetes" appearing
  in a large fraction of pages) funnels into one reducer. Spark's partial
  aggregation absorbs *algebraic* aggs (sum/count/min/max), but holistic
  ones (collect_list/set, exact distinct) still ship every row to one
  partition. ``salted_agg`` does the classic two-phase: group by
  (key, salt) -> partial, then by key -> merge.
- **join skew with a known-hot build side** where AQE is unavailable
  (e.g. inside checkpointed stage boundaries): ``salted_join`` explodes
  the small side per salt and salts the big side's key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, cols: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of the row's salt columns
    (default: all) — reproducible across retries, unlike rand()."""
    basis = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(*basis), F.lit(n_salts)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    partial: list[Column],
    merge: Callable[[DataFrame], DataFrame],
    n_salts: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation over a skewed key.

    ``partial``: aggregate expressions for the (key, salt) phase.
    ``merge``: function receiving the partially-aggregated DataFrame
    (grouped rows per (key, salt)) and producing the final per-key frame.

    Example (distinct urls per hot code):
        salted_agg(triples, "code",
                   [F.collect_set("subj").alias("urls")],
                   lambda d: d.groupBy("code").agg(
                       F.array_distinct(F.flatten(F.collect_list("urls")))
                        .alias("urls")))
    """
    keys = [key] if isinstance(key, str) else list(key)
    salted = with_salt(df, n_salts, salt_cols)
    phase1 = salted.groupBy(*keys, "_salt").agg(*partial)
    return merge(phase1.drop("_salt") if "_salt" not in keys else phase1)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the small side is replicated n_salts times
    (one copy per salt), the big side's rows are salted by hash of their
    full row, so a hot key's rows spread across n_salts reducers."""
    small_exp = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(n_salts).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    big_salted = with_salt(big, n_salts)
    return big_salted.join(small_exp, [key, "_salt"], how).drop("_salt")
