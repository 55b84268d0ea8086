"""spark-submit entrypoint: the whole reference service path (Flask ->
Celery -> subprocess -> Mongo, SURVEY.md §3.1) collapsed into one driver
program.

Usage:
  zip -qr engine.zip ner_linking_demo_spark
  spark-submit --py-files engine.zip ner_linking_demo_spark/__main__.py \
      --pages /data/pages_parquet --gazetteer /data/gazetteer.tsv \
      --out /data/kg --checkpoint /data/ckpt --k 3

``--pages`` accepts a parquet directory or an Iceberg table name
(catalog configured via session.get_spark / NLDS_ICEBERG_WAREHOUSE).
``--gazetteer`` accepts a TSV with columns
label, code, term, semantic_tag, mainterm, language
(shape per `/root/reference/server/linking/src/utils/
gazetteer_pre_process.py:24-25`).
"""

from __future__ import annotations

import argparse
import os

import pandas as pd


def main(argv: list[str] | None = None, stop_session: bool = True) -> None:
    ap = argparse.ArgumentParser(prog="ner_linking_demo_spark")
    ap.add_argument("--pages", required=True, help="parquet dir or table name")
    ap.add_argument("--gazetteer", required=True, help="gazetteer TSV path")
    ap.add_argument("--out", required=True, help="output dir / namespace")
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir")
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--input-sig", default=None, help="resume signature")
    args = ap.parse_args(argv)

    # absolute imports: this file is also submitted as a bare script path
    # (spark-submit --py-files engine.zip .../__main__.py), where relative
    # imports have no package context
    from ner_linking_demo_spark.plans.pipeline import (
        run_pipeline,
        verify_invariants,
    )
    from ner_linking_demo_spark.session import get_spark

    spark = get_spark(app_name="kg-construct")
    if os.path.exists(args.pages) or args.pages.endswith(".parquet") or "/" in args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        pages = spark.read.table(args.pages)
    gaz = pd.read_csv(args.gazetteer, sep="\t", dtype={"code": str})

    res = run_pipeline(
        spark,
        pages,
        gaz,
        k=args.k,
        checkpoint_dir=args.checkpoint,
        num_partitions=args.partitions,
        input_sig=args.input_sig,
    )
    for name, df in (
        ("triples", res.triples),
        ("entities", res.entities),
        ("edges", res.edges),
    ):
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")
    print("invariants:", verify_invariants(res))
    if stop_session:  # False for in-process (test) callers sharing a session
        spark.stop()


if __name__ == "__main__":
    main()
