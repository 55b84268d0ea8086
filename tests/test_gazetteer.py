"""A1 seeded disambiguation + F5 decoration: parity with the reference's
``read_gazetteer_to_dict`` (loaded from /root/reference when present) and
driver-vs-distributed equivalence."""

from __future__ import annotations

import importlib.util
import os

import pytest

from ner_linking_demo_spark.functions.gazetteer import (
    decorate_term,
    disambiguate_terms,
    disambiguate_terms_df,
)
from ner_linking_demo_spark.sources.fixtures import gen_gazetteer

REF_GAZ = "/root/reference/server/linking/src/utils/gazetteer_pre_process.py"


@pytest.fixture(scope="module")
def gaz():
    return gen_gazetteer(n_codes=60, ambiguous_frac=0.2)


def test_decoration_trailing_space():
    assert decorate_term("gripe", "trastorno") == "gripe [trastorno] "


def test_parity_with_reference(gaz):
    if not os.path.exists(REF_GAZ):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_gaz", REF_GAZ)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sub = gaz[gaz["label"] == "disease"][
        ["code", "term", "semantic_tag", "mainterm", "language"]
    ].copy()
    ref_dict = mod.read_gazetteer_to_dict(sub.copy(), verbose=False)
    ours = disambiguate_terms(sub)
    assert ours == ref_dict


def test_distributed_matches_driver(spark, gaz):
    sub = gaz[gaz["label"] == "procedure"]
    driver = disambiguate_terms(sub)
    dist = disambiguate_terms_df(spark.createDataFrame(sub)).toPandas()
    assert dict(zip(dist["term"], dist["code"])) == driver


def test_ambiguity_resolved(gaz):
    sub = gaz[gaz["label"] == "disease"]
    d = disambiguate_terms(sub)
    decorated = {
        decorate_term(t, s) for t, s in zip(sub["term"], sub["semantic_tag"])
    }
    assert set(d.keys()) == decorated  # every term got exactly one code
