"""S3: gazetteer TSV CLI scan path — round-trip a TSV gazetteer through
the __main__ entrypoint to triples on disk (the only SURVEY §2.1 in-scope
source previously untested)."""

from __future__ import annotations

import pandas as pd

from ner_linking_demo_spark import __main__ as CLI
from ner_linking_demo_spark.sources import fixtures as FX


def test_cli_tsv_gazetteer_roundtrip(spark, tmp_path):
    gaz = FX.gen_gazetteer(n_codes=12)
    tsv = tmp_path / "gaz.tsv"
    gaz.to_csv(tsv, sep="\t", index=False)

    pages_dir = tmp_path / "pages"
    FX.pages_to_spark(
        spark, FX.gen_pages(n_pages=12, gazetteer=gaz)
    ).write.parquet(str(pages_dir))

    out = tmp_path / "kg"
    CLI.main(
        [
            "--pages", str(pages_dir),
            "--gazetteer", str(tsv),
            "--out", str(out),
            "--k", "3",
        ],
        stop_session=False,  # the pytest session fixture owns the session
    )
    import duckdb

    triples = duckdb.sql(f"SELECT * FROM '{out}/triples/*.parquet'").df()
    assert len(triples) > 0
    assert {"subj", "pred", "obj", "code", "rank"} <= set(triples.columns)
    # TSV string codes survive the round trip (codes are strings, F7)
    assert triples["code"].map(lambda c: isinstance(c, str)).all()
    edges = duckdb.sql(f"SELECT * FROM '{out}/edges/*.parquet'").df()
    assert len(edges) == len(edges.drop_duplicates(["src", "rel", "dst"]))
