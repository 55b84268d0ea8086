"""Driver-window slots rotated out in round 4 keep their EXACT oracle
compare here: same rows + sorted-columns + order-insensitive value-hash
check the driver runs, just pytest-gated (the driver checks only the
first 50 registry entries; these three were retired to free slots for
the round-3 composition oracles)."""

from __future__ import annotations

import duckdb
import pytest

from ner_linking_demo_spark.plans.entry_queries import RETIRED
from tools.selfcheck import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def test_retired_registry_holds_the_rotated_entries():
    assert sorted(q.name for q in RETIRED) == [
        "a11_best_k",  # r5: eval family stays via eval_prf_at_k
        "a2_group_concat",
        "a3_log_prob_product",
        "a6_topk_count_sum",
        "ann_bruteforce_topk",
        "ann_lsh_topk",
        "cand_term_avg",
        "dedup_embedding_cosine",  # r5: LSH sibling stays driver-gated
        "dedup_minhash_signature",
        "j4_part_lookup",
        "kg_detect_mentions",
        "kg_detect_mentions_crf",
        "kg_detect_mentions_ensemble",
    ]
    assert all(q.sql for q in RETIRED)


@pytest.mark.parametrize(
    "qd", RETIRED, ids=lambda qd: qd.name
)
def test_retired_entry_matches_oracle(spark, duck, qd):
    spark_df = qd.fn(spark, SF_DIR).toPandas()
    duck_df = duck.execute(qd.sql).df()
    assert len(spark_df) == len(duck_df), qd.name
    assert sorted(spark_df.columns) == sorted(duck_df.columns), qd.name
    assert value_hash(spark_df) == value_hash(duck_df), qd.name
