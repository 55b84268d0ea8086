"""Salting helpers + giant-page segmentation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ner_linking_demo_spark.functions.salting import (
    salted_agg,
    salted_join,
    with_salt,
)
from ner_linking_demo_spark.operators.ner import detect_mentions
from ner_linking_demo_spark.operators.segmentation import (
    detect_mentions_segmented,
    segment_pages,
    split_text,
)
from ner_linking_demo_spark.sources.fixtures import (
    gen_gazetteer,
    gen_pages,
    pages_to_spark,
)


def test_with_salt_deterministic_and_spread(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(1000)], ["k", "v"]
    )
    s1 = with_salt(df, 8).toPandas()
    s2 = with_salt(df, 8).toPandas()
    assert (s1["_salt"] == s2["_salt"]).all()  # retry-stable
    assert s1["_salt"].nunique() == 8  # hot key spreads over all salts
    assert s1["_salt"].between(0, 7).all()


def test_salted_agg_matches_plain(spark):
    rows = [("hot", f"u{i % 50}") for i in range(2000)] + [
        ("cold", f"u{i}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["code", "subj"])
    plain = {
        r["code"]: sorted(r["urls"])
        for r in df.groupBy("code")
        .agg(F.collect_set("subj").alias("urls"))
        .collect()
    }
    salted = salted_agg(
        df,
        "code",
        [F.collect_set("subj").alias("urls")],
        lambda d: d.groupBy("code").agg(
            F.array_distinct(F.flatten(F.collect_list("urls"))).alias("urls")
        ),
        n_salts=8,
    )
    got = {r["code"]: sorted(r["urls"]) for r in salted.collect()}
    assert got == plain


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(3000)] + [("k2", i) for i in range(10)],
        ["k", "v"],
    )
    small = spark.createDataFrame([("hot", "H"), ("k2", "K")], ["k", "name"])
    plain = set(
        map(tuple, big.join(small, "k").select("k", "v", "name").collect())
    )
    got = set(
        map(
            tuple,
            salted_join(big, small, "k", n_salts=8)
            .select("k", "v", "name")
            .collect(),
        )
    )
    assert got == plain


# --- segmentation -----------------------------------------------------------


def test_split_text_covers_and_overlaps():
    text = " ".join(f"w{i:04d}" for i in range(1000))
    segs = split_text(text, max_chars=600, overlap_words=5)
    assert len(segs) > 1
    for base, owned_end, seg in segs:
        assert text[base : base + len(seg)] == seg  # offsets exact
        assert base < owned_end <= base + len(seg)
    # every char is covered; owned ranges partition the text
    covered = set()
    for base, owned_end, seg in segs:
        covered.update(range(base, base + len(seg)))
    assert covered == set(range(len(text)))
    bounds = [(b, o) for b, o, _ in segs]
    for (b1, o1), (b2, _) in zip(bounds, bounds[1:]):
        assert b2 == o1  # next segment starts where ownership ends
    assert bounds[0][0] == 0 and segs[-1][1] == len(text)


def test_split_small_text_passthrough():
    assert split_text("hola mundo", 100, 4) == [(0, 10, "hola mundo")]


@pytest.fixture(scope="module")
def giant_corpus(spark):
    gaz = gen_gazetteer(n_codes=40)
    pages = gen_pages(n_pages=25, gazetteer=gaz, giant_every=5)
    return gaz, pages, pages_to_spark(spark, pages)


def test_segmented_detection_byte_identical(spark, giant_corpus):
    gaz, pages_pdf, pages = giant_corpus
    plain = (
        detect_mentions(pages, gaz)
        .toPandas()
        .sort_values(["url", "start", "end", "label"])
        .reset_index(drop=True)
    )
    seg = (
        detect_mentions_segmented(pages, gaz, max_chars=2000)
        .toPandas()
        .sort_values(["url", "start", "end", "label"])
        .reset_index(drop=True)
    )
    assert plain[["url", "label", "start", "end", "span"]].astype(str).equals(
        seg[["url", "label", "start", "end", "span"]].astype(str)
    )


def test_segments_actually_split(spark, giant_corpus):
    _, pages_pdf, pages = giant_corpus
    segs = segment_pages(pages, max_chars=2000).toPandas()
    per_url = segs.groupby("url").size()
    assert per_url.max() > 1  # giant pages split
    assert (segs.groupby("url")["seg_id"].min() == 0).all()
