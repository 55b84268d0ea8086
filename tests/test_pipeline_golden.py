"""Golden end-to-end: Spark engine vs pure-pandas oracle on fixture pages
including the verbatim clinical case (SURVEY.md §5 pyramid (b)), plus the
triple-level P/R >= 0.95 acceptance gate (BASELINE.json) and the
byte-identical-text invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ner_linking_demo_spark.operators.linking import build_indexes, link_mentions
from ner_linking_demo_spark.operators.ner import detect_mentions
from ner_linking_demo_spark.oracle import (
    oracle_link,
    oracle_mentions,
    oracle_triples,
)
from ner_linking_demo_spark.plans.pipeline import run_pipeline, verify_invariants
from ner_linking_demo_spark.sources.fixtures import (
    extract_text_from_html,
    pages_to_spark,
)

KEY = ["url", "start", "end", "label"]


@pytest.fixture(scope="module")
def spark_pages(spark, golden_pages):
    return pages_to_spark(spark, golden_pages)


@pytest.fixture(scope="module")
def o_mentions(golden_pages, golden_gazetteer):
    return oracle_mentions(golden_pages, golden_gazetteer)


@pytest.fixture(scope="module")
def o_linked(o_mentions, golden_gazetteer):
    return oracle_link(o_mentions, golden_gazetteer, k=3)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in ("start", "end"):
        if c in out.columns:
            out[c] = out[c].astype("int64")
    return out.sort_values(KEY).reset_index(drop=True)


def test_byte_identical_text(golden_pages):
    # input invariant: text == extract(html), byte-for-byte, per url
    for r in golden_pages.itertuples():
        assert extract_text_from_html(r.html) == r.text


def test_mentions_parity(spark_pages, golden_gazetteer, o_mentions):
    got = detect_mentions(spark_pages, golden_gazetteer).toPandas()
    assert _norm(got).equals(_norm(o_mentions))


def test_clinical_case_offsets(o_mentions, gold_mentions, golden_pages):
    """On the verbatim clinical case, the surrogate NER must recover every
    gold mention at its exact gold character offsets."""
    url0 = golden_pages.iloc[0]["url"]
    doc0 = o_mentions[o_mentions["url"] == url0]
    got = {
        (r.label, int(r.start), int(r.end), r.span) for r in doc0.itertuples()
    }
    want = {
        (r.label, int(r.start), int(r.end), r.span)
        for r in gold_mentions.itertuples()
    }
    assert want <= got
    # and spans slice back from the original text
    text = golden_pages.iloc[0]["text"]
    for label, start, end, span in got:
        assert text[start:end] == span


def test_linking_parity(spark_pages, golden_gazetteer, o_linked):
    mentions = detect_mentions(spark_pages, golden_gazetteer)
    idx = build_indexes(golden_gazetteer, k=3)
    got = _norm(link_mentions(mentions, idx, k=3).toPandas())
    want = _norm(o_linked)
    assert len(got) == len(want)
    for i in range(len(want)):
        a, b = want.iloc[i], got.iloc[i]
        assert list(a.codes) == list(b.codes), (i, a.span)
        assert np.allclose(
            np.array(a.scores, dtype=np.float32),
            np.array(b.scores, dtype=np.float32),
            atol=1e-6,
        )


@pytest.mark.parametrize("variant", ["fused_link", "detect_and_link"])
def test_fused_linking_matches_windowed(
    spark_pages, golden_gazetteer, o_linked, variant
):
    """The fused single-stage plans (link_mentions_fused; detect_and_link)
    must be result-identical to the exploded-candidates + W3-window plan
    and hence to the oracle."""
    from ner_linking_demo_spark.operators.linking import (
        detect_and_link,
        link_mentions_fused,
    )

    idx = build_indexes(golden_gazetteer, k=3)
    if variant == "fused_link":
        mentions = detect_mentions(spark_pages, golden_gazetteer)
        got_df = link_mentions_fused(mentions, idx, k=3)
    else:
        got_df = detect_and_link(spark_pages, golden_gazetteer, idx, k=3)
    got = _norm(got_df.toPandas())
    want = _norm(o_linked)
    assert len(got) == len(want)
    for i in range(len(want)):
        a, b = want.iloc[i], got.iloc[i]
        assert list(a.codes) == list(b.codes), (i, a.span)
        assert np.allclose(
            np.array(a.scores, dtype=np.float32),
            np.array(b.scores, dtype=np.float32),
            atol=1e-6,
        )


def test_end_to_end_triples_pr(
    spark, spark_pages, golden_pages, golden_gazetteer, tmp_path
):
    """Acceptance gate: triple P/R >= 0.95 vs the oracle on exact
    (subj, pred, code) matches (evaluation.py:151-165 micro style) — by
    construction the parity is exact, so the gate asserts 1.0-level P/R,
    plus invariant queries all zero."""
    res = run_pipeline(
        spark,
        spark_pages,
        golden_gazetteer,
        k=3,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    o_m = oracle_mentions(golden_pages, golden_gazetteer)
    o_l = oracle_link(o_m, golden_gazetteer, k=3)
    o_t, o_e, o_edges = oracle_triples(o_l, golden_gazetteer)

    got = {
        (r.subj, r.pred, r.code)
        for r in res.triples.select("subj", "pred", "code").collect()
    }
    want = {(r.subj, r.pred, r.code) for r in o_t.itertuples()}
    tp = len(got & want)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(want), 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)

    # entity/edge parity
    got_edges = {
        (r.src, r.rel, r.dst) for r in res.edges.collect()
    }
    want_edges = {(r.src, r.rel, r.dst) for r in o_edges.itertuples()}
    assert got_edges == want_edges

    ents = res.entities.toPandas().sort_values("entity_id").reset_index(drop=True)
    assert list(ents["entity_id"]) == list(o_e["entity_id"])
    assert list(ents["canonical_code"]) == list(o_e["canonical_code"])
    for a, b in zip(ents["aliases"], o_e["aliases"]):
        assert list(a) == list(b)

    bad = verify_invariants(res)
    assert all(v == 0 for v in bad.values()), bad


def test_entities_local_vs_distributed(spark, golden_gazetteer):
    """Driver-side union-find entity build == distributed CC entity build."""
    from ner_linking_demo_spark.operators.triples import (
        build_entities,
        build_entities_local,
    )

    gdf = spark.createDataFrame(
        golden_gazetteer[["label", "code", "term", "semantic_tag"]]
    )
    e_d, c2e_d = build_entities(gdf)
    e_l, c2e_l = build_entities_local(spark, golden_gazetteer)
    pd_d = e_d.toPandas().sort_values("entity_id").reset_index(drop=True)
    pd_l = e_l.toPandas().sort_values("entity_id").reset_index(drop=True)
    assert list(pd_d["entity_id"]) == list(pd_l["entity_id"])
    assert list(pd_d["canonical_code"]) == list(pd_l["canonical_code"])
    for a, b in zip(pd_d["aliases"], pd_l["aliases"]):
        assert list(a) == list(b)
    m_d = {(r.code, r.entity_id) for r in c2e_d.collect()}
    m_l = {(r.code, r.entity_id) for r in c2e_l.collect()}
    assert m_d == m_l


def test_obj_is_entity_id(spark, spark_pages, golden_gazetteer):
    res = run_pipeline(spark, spark_pages, golden_gazetteer, k=3)
    joined = (
        res.triples.join(
            res.entities, res.triples.obj == res.entities.entity_id, "left_anti"
        ).count()
    )
    assert joined == 0  # every obj resolves to an entity row
