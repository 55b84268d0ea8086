"""J8 parent-code expansion: semantics vs a hand-built hierarchy,
multi-synonym vocab merge, and the dropped-and-counted contract."""

from __future__ import annotations

from ner_linking_demo_spark.operators.hierarchy import expand_parent_codes


def test_expand_parent_codes(spark):
    vocab = spark.createDataFrame(
        [
            ("root", "root term", []),
            ("root", "root synonym", []),  # multi-synonym code
            ("mid", "mid term", ["root"]),
            ("leaf", "leaf term", ["mid", "root"]),
            ("orphan", "orphan term", ["missing-parent"]),
        ],
        "code string, term string, parents array<string>",
    )
    corpus = spark.createDataFrame(
        [("leaf",), ("mid",), ("orphan",), ("unknown",), ("leaf",)],
        "code string",
    )
    expanded, not_found = expand_parent_codes(corpus, vocab)
    rows = {r.code: r for r in expanded.collect()}
    assert set(rows) == {"leaf", "mid", "orphan"}  # unknown dropped, dup collapsed
    assert rows["leaf"].parent_codes == ["mid", "root"]
    assert rows["leaf"].strings == sorted(
        ["mid term", "root term", "root synonym", "leaf term"]
    )
    assert rows["mid"].parent_codes == ["root"]
    assert rows["mid"].strings == sorted(
        ["root term", "root synonym", "mid term"]
    )
    # parent missing from vocab: code kept, parent id kept, no string
    assert rows["orphan"].parent_codes == ["missing-parent"]
    assert rows["orphan"].strings == ["orphan term"]
    assert [r.code for r in not_found.collect()] == ["unknown"]
