"""S4 term-embedding cache: compute-once, load-identical, invalidate on
gazetteer change."""

from __future__ import annotations

import os

import numpy as np

from ner_linking_demo_spark.sources.embeddings_cache import build_or_load
from ner_linking_demo_spark.sources.fixtures import gen_gazetteer


def test_cache_roundtrip(spark, tmp_path):
    gaz = gen_gazetteer(n_codes=25)
    cache = str(tmp_path / "emb")
    idx1 = build_or_load(spark, gaz, cache, k=3)
    files1 = os.listdir(cache)
    assert len(files1) == 1
    idx2 = build_or_load(spark, gaz, cache, k=3)  # loads, no new file
    assert os.listdir(cache) == files1
    for label in idx1:
        a, b = idx1[label], idx2[label]
        assert a.terms == b.terms and a.codes == b.codes
        assert a.max_n_texts == b.max_n_texts
        assert np.array_equal(a.matrix, b.matrix)

    # changed gazetteer -> new cache entry
    gaz2 = gen_gazetteer(n_codes=26)
    build_or_load(spark, gaz2, cache, k=3)
    assert len(os.listdir(cache)) == 2
