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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ner_linking_demo_spark.plans import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG-construction pipeline (pages -> NER ->
    linking -> canonicalized triples) over sf0.001 documents-as-pages."""
    return EQ.kg_triples_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return EQ.queries()


def oracle_sql() -> dict[str, str]:
    return EQ.oracle_sql()
