"""PageRank over the entity graph — entity-importance scoring for the
materialized KG (§2.10 extension alongside connected components; the
reference has no graph analytics, its closest artifact being the edge
table the demo writes to Mongo — SURVEY S8).

Spark-first power iteration, the GraphFrames/Pregel shape expressed in
plain DataFrame ops:

- the edge list is hash-partitioned ON src ONCE and localCheckpoint-ed;
  every iteration's contribution join then reuses that clustering and
  only the (node, rank) table — two doubles per node, tiny relative to
  any real edge set — moves per round;
- contributions aggregate with ``groupBy(dst).sum`` — map-side partial
  aggregation absorbs hot destinations (popular entities are exactly
  the skewed keys at web scale);
- dangling mass (nodes with no out-edges) is a one-row distributed
  aggregate per iteration, redistributed uniformly — without it rank
  leaks and the vector no longer sums to 1;
- rank state is localCheckpoint-ed per iteration to truncate lineage
  (same discipline as canonicalize.connected_components);
- convergence = L1 delta between successive vectors (one distributed
  aggregate per iteration, O(1) to the driver), stop at ``tol``.

Determinism: float summation order inside a shuffle aggregate is not
fixed, so ranks are reproducible to float tolerance, not bit-identical
— the documented contract (the convergence tests compare against the
numpy oracle at 1e-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) directed edges -> (node, rank), ranks summing to 1.

    Parallel edges are collapsed first (dropDuplicates): an entity pair
    asserted by many pages is one endorsement, not many — pass
    pre-weighted edges through :func:`weighted_pagerank` semantics
    yourself if multiplicity should count.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    ).dropDuplicates(["src", "dst"])
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    else:
        e = e.repartition("src")
    e = e.localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # (node, deg) with deg NULL for dangling nodes — joined once, rides
    # the rank table so the per-iteration work never re-derives it
    base = nodes.join(
        out_deg.withColumnRenamed("src", "node"), "node", "left"
    ).localCheckpoint(eager=True)

    ranks = base.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        dangling = (
            ranks.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            e.join(
                ranks.select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        new_ranks = (
            base.join(
                contribs.withColumnRenamed("dst", "node"), "node", "left"
            )
            .withColumn(
                "rank",
                F.lit((1.0 - damping) / n + damping * dangling / n)
                + F.lit(damping) * F.coalesce("contrib", F.lit(0.0)),
            )
            .drop("contrib")
            .localCheckpoint(eager=True)
        )
        if tol > 0.0:
            delta = (
                new_ranks.select(
                    F.col("node"), F.col("rank").alias("new_rank")
                )
                .join(ranks.select("node", "rank"), "node")
                .agg(F.sum(F.abs(F.col("new_rank") - F.col("rank"))))
                .first()[0]
            )
        else:
            # tol=0 means "run exactly max_iter iterations": skip the
            # delta join entirely — one fewer distributed job per round
            delta = None
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    return ranks.select("node", "rank")


def entity_pagerank(
    kg_edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """PageRank over the KG pipeline's materialized edges table
    (src, rel, dst from operators/triples.build_triples) — the
    entity-importance diagnostic a KG consumer ranks/prunes with."""
    return pagerank(
        kg_edges.select("src", "dst"),
        damping=damping,
        max_iter=max_iter,
        tol=tol,
    )
