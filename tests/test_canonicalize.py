"""Connected components (large-star/small-star DataFrame iteration) vs a
union-find oracle on random graphs, including hot-key star skew."""

from __future__ import annotations

import random

import pytest

from ner_linking_demo_spark.operators.canonicalize import connected_components
from ner_linking_demo_spark.oracle.oracle import oracle_components


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    return [
        (f"n{rng.randrange(n_nodes):04d}", f"n{rng.randrange(n_nodes):04d}")
        for _ in range(n_edges)
    ]


@pytest.mark.parametrize(
    "n_nodes,n_edges,seed,driver_threshold",
    [
        (30, 20, 1, 0),          # distributed alternating-star path
        (100, 80, 2, 0),
        (200, 400, 3, 0),
        (200, 400, 3, 200_000),  # driver union-find fast path
    ],
)
def test_cc_matches_union_find(spark, n_nodes, n_edges, seed, driver_threshold):
    edges = _random_edges(n_nodes, n_edges, seed)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            df, driver_threshold=driver_threshold
        ).collect()
    }
    want = oracle_components(edges)
    assert got == want


def test_cc_hot_star_skew(spark):
    """One hub connected to many spokes + a long chain through it — the
    hot-key shape that motivates partial aggregation."""
    edges = [("hub", f"s{i:05d}") for i in range(2000)]
    edges += [(f"c{i:03d}", f"c{i+1:03d}") for i in range(50)]
    edges += [("c000", "hub")]
    df = spark.createDataFrame(edges, ["src", "dst"]).repartition(8)
    got = connected_components(df, driver_threshold=0)  # force distributed
    comps = got.select("component").distinct().collect()
    assert len(comps) == 1
    assert comps[0]["component"] == "c000"  # lexicographic min node


def test_cc_isolated_self_loop(spark):
    df = spark.createDataFrame(
        [("a", "a"), ("b", "c")], ["src", "dst"]
    )
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "b", "c": "b"}
