"""PageRank over the entity graph — entity-importance scoring for the
materialized KG (§2.10 extension alongside connected components; the
reference has no graph analytics, its closest artifact being the edge
table the demo writes to Mongo — SURVEY S8).

Spark-first power iteration, the GraphFrames/Pregel shape expressed in
plain DataFrame ops:

- the edge list is materialized ONCE (localCheckpoint), so per-round
  cost is the contribution join + aggregate, never a re-derivation of
  the input. NOTE a checkpointed RDD does NOT report its partitioning
  to Catalyst, so the join still exchanges the edge side each round
  (plan-verified); for the at-rest form that genuinely eliminates the
  per-round edge shuffle, write the edges as a bucketed table
  (:func:`write_bucketed_edges`) — a bucketed scan reports hash
  clustering on ``src``, and only the (node, rank) vector — two doubles
  per node, tiny relative to any real edge set — moves per round;
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
    prepared: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """(src, dst) directed edges -> (node, rank), ranks summing to 1.

    Without ``weight_col``, parallel edges are collapsed first
    (dropDuplicates): an entity pair asserted by many pages is one
    endorsement, not many. WITH ``weight_col`` (weighted PageRank —
    e.g. assertion counts or rerank scores as edge strength), each
    source distributes its rank proportionally to edge weight
    (share = rank * w / sum_w over the source's out-edges); duplicate
    (src, dst) pairs are summed into one weighted edge. Non-positive or
    null weights raise — they would silently invert or leak rank mass.

    ``prepared=True`` means the caller's ``edges`` is already
    materialized in the layout it should be iterated over — e.g. a scan
    of a :func:`write_bucketed_edges` table, whose bucket clustering on
    ``src`` would be DESTROYED by the repartition+checkpoint this
    function otherwise applies.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if prepared:
        # trust the layout AND the content: a prepared input (e.g. a
        # write_bucketed_edges scan) is already deduplicated /
        # weight-aggregated, and any dedup or repartition here would
        # insert the very Exchange the bucketed layout exists to avoid
        # (dropDuplicates reclusters on (src, dst) — per ITERATION,
        # since e is re-planned each round)
        w = (
            F.col(weight_col).cast("double")
            if weight_col is not None
            else F.lit(1.0)
        )
        e = edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
            w.alias("w"),
        )
    else:
        if weight_col is None:
            e = edges.select(
                F.col(src_col).cast("string").alias("src"),
                F.col(dst_col).cast("string").alias("dst"),
                F.lit(1.0).alias("w"),
            ).dropDuplicates(["src", "dst"])
        else:
            bad = edges.filter(
                F.col(weight_col).isNull() | (F.col(weight_col) <= 0)
            )
            if bad.limit(1).count() > 0:
                raise ValueError(
                    "edge weights must be positive and non-null (a zero/"
                    "negative weight inverts rank flow; a null leaks mass)"
                )
            e = (
                edges.select(
                    F.col(src_col).cast("string").alias("src"),
                    F.col(dst_col).cast("string").alias("dst"),
                    F.col(weight_col).cast("double").alias("w"),
                )
                .groupBy("src", "dst")
                .agg(F.sum("w").alias("w"))
            )
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

    # deg = total out-WEIGHT (count when unweighted: w = 1.0 per edge)
    out_deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
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
                    (F.col("rank") / F.col("deg")).alias("rate"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rate") * F.col("w")).alias("contrib"))
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


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    n_buckets: int = 64,
    path: str | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> None:
    """Materialize the edge list as a Spark BUCKETED table clustered on
    ``src`` — the at-rest layout for iterative graph jobs. A bucketed
    scan reports its hash partitioning to Catalyst, so every power-iter
    contribution join exchanges ONLY the (node, rank) vector; a
    checkpointed DataFrame cannot provide this (its partitioning is
    opaque to the optimizer — plan-asserted in tests). Same pattern as
    similarity.write_bucketed_index: at web scale this is the
    difference between re-shuffling the multi-TB edge list every
    iteration and never moving it at all.

    Read back with ``spark.table(table)`` and pass
    ``pagerank(..., prepared=True)``."""
    writer = (
        edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
        .write.bucketBy(n_buckets, "src")
        .sortBy("src")
        .mode("overwrite")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


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
