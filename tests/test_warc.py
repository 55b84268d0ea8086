"""WARC source: roundtrip fidelity (plain + gzip, resource + response
records), input_hint shape, and pipeline parity vs the parquet path."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

from ner_linking_demo_spark.sources import fixtures as FX
from ner_linking_demo_spark.sources import warc as W


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    gaz = FX.gen_gazetteer(n_codes=15)
    pages = FX.gen_pages(n_pages=14, gazetteer=gaz)
    # two archives, one gzipped -> two tasks, both codec branches
    W.write_warc_fixture(pages.iloc[:7], str(d / "a.warc"))
    W.write_warc_fixture(pages.iloc[7:], str(d / "b.warc.gz"), compress=True)
    return d, gaz, pages


def test_warc_roundtrip_byte_identity(spark, warc_dir):
    d, _, pages = warc_dir
    got = W.read_warc(spark, str(d)).toPandas()
    assert len(got) == len(pages)
    g = got.set_index("url")
    for _, r in pages.iterrows():
        row = g.loc[r["url"]]
        assert bytes(row["html"]) == bytes(r["html"])  # byte-identical
        want = pd.Timestamp(r["warc_ts"])
        if want.tzinfo is not None:
            want = want.tz_convert("UTC").tz_localize(None)
        assert pd.Timestamp(row["warc_ts"]) == want


def test_warc_response_records_strip_http_envelope(spark, tmp_path):
    """response-type records carry an HTTP envelope; the body after the
    first blank line is the page, byte-identical."""
    body = FX.wrap_html("cuerpo de prueba")
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    )
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.example/p\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload + b"\r\n\r\n"
    )
    p = tmp_path / "r.warc.gz"
    p.write_bytes(gzip.compress(rec))
    got = W.read_warc(spark, str(p)).collect()
    assert len(got) == 1
    assert bytes(got[0]["html"]) == body
    assert got[0]["url"] == "https://x.example/p"


def test_pages_from_warc_full_shape_and_pipeline_parity(spark, warc_dir):
    d, gaz, pages = warc_dir
    from ner_linking_demo_spark.plans.pipeline import run_pipeline

    df = W.pages_from_warc(spark, str(d))
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]
    # text column is the byte-exact extraction
    tx = {r["url"]: r["text"] for r in df.collect()}
    assert tx == dict(zip(pages["url"], pages["text"]))

    key = ["subj", "pred", "code", "start", "end", "rank"]
    got = run_pipeline(spark, df, gaz, k=3).triples
    ref = run_pipeline(
        spark, FX.pages_to_spark(spark, pages), gaz, k=3
    ).triples
    assert {tuple(r) for r in got.select(*key).collect()} == {
        tuple(r) for r in ref.select(*key).collect()
    }


def test_cli_warc_input(spark, warc_dir, tmp_path):
    import duckdb

    from ner_linking_demo_spark import __main__ as CLI

    d, gaz, pages = warc_dir
    tsv = tmp_path / "gaz.tsv"
    gaz.to_csv(tsv, sep="\t", index=False)
    out = tmp_path / "kg"
    CLI.main(
        ["--pages", str(d), "--pages-format", "warc",
         "--gazetteer", str(tsv), "--out", str(out), "--k", "3"],
        stop_session=False,
    )
    n = duckdb.sql(
        f"SELECT count(*) AS n FROM '{out}/triples/*.parquet'"
    ).df()["n"][0]
    assert n > 0


def test_warc_golden_roundtrip_cli_parity(spark, tmp_path):
    """Round-4 verdict item 4 — the full fidelity chain at the USER
    surface: a golden .warc.gz with PER-RECORD gzip members (the actual
    Common Crawl layout) and HTTP-response envelopes, driven through the
    CLI with --pages-format warc, must produce (a) byte-identical
    extracted text and (b) exactly the triples of the same pages fed
    through the parquet path."""
    import duckdb

    from ner_linking_demo_spark import __main__ as CLI

    gaz = FX.gen_gazetteer(n_codes=15)
    pages = FX.gen_pages(n_pages=12, gazetteer=gaz)
    warc = tmp_path / "golden.warc.gz"
    W.write_warc_fixture(
        pages, str(warc), member_gzip=True, record_type="response"
    )

    # (a) extraction fidelity straight off the archive
    tx = {
        r["url"]: r["text"]
        for r in W.pages_from_warc(spark, str(warc)).collect()
    }
    assert tx == dict(zip(pages["url"], pages["text"]))

    tsv = tmp_path / "gaz.tsv"
    gaz.to_csv(tsv, sep="\t", index=False)
    FX.pages_to_spark(spark, pages).write.parquet(str(tmp_path / "pq"))

    CLI.main(
        ["--pages", str(warc), "--pages-format", "warc",
         "--gazetteer", str(tsv), "--out", str(tmp_path / "kg_warc"),
         "--k", "3"],
        stop_session=False,
    )
    CLI.main(
        ["--pages", str(tmp_path / "pq"),
         "--gazetteer", str(tsv), "--out", str(tmp_path / "kg_pq"),
         "--k", "3"],
        stop_session=False,
    )
    q = (
        "SELECT subj, pred, code, start, \"end\", rank, span "
        "FROM '{}/triples/*.parquet'"
    )
    a = {tuple(r) for r in duckdb.sql(
        q.format(tmp_path / "kg_warc")).fetchall()}
    b = {tuple(r) for r in duckdb.sql(
        q.format(tmp_path / "kg_pq")).fetchall()}
    assert a and a == b  # archive-in => identical triples-out
