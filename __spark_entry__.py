"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``ner_linking_demo_spark`` (the engine
package); this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from ner_linking_demo_spark.plans import entry_queries as EQ  # noqa: E402

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Executor python workers import the engine package when unpickling
    UDFs; if the driver wasn't launched from the repo root their
    PYTHONPATH won't have it — ship the package zip via addPyFile once
    per SparkContext (the spark-submit --py-files equivalent)."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="nlds_ship_")
    zip_base = os.path.join(tmp, "ner_linking_demo_spark")
    shutil.make_archive(
        zip_base, "zip", root_dir=_REPO, base_dir="ner_linking_demo_spark"
    )
    sc.addPyFile(zip_base + ".zip")
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG-construction pipeline (pages -> NER ->
    linking -> canonicalized triples) over sf0.001 documents-as-pages."""
    _ensure_shipped(spark)
    return EQ.kg_triples_e2e(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in EQ.queries().items()}


def oracle_sql() -> dict[str, str]:
    return EQ.oracle_sql()
