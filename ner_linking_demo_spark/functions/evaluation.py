"""Evaluation aggregations (reference `server/linking/src/utils/
evaluation.py`): P@k / R@k / Acc@k over per-mention gold-vs-predicted
code sets, and micro P/R/F1 over exact triple matches — the shape of the
BASELINE acceptance metric (triples P/R >= 0.95).

DataFrame-native: per-mention set arithmetic with array functions, means
via agg — no sklearn (absent from this image; the reference used
MultiLabelBinarizer + sklearn micro scores, `evaluation.py:151-165`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MENTION_KEY = ["url", "start", "end", "label"]


def precision_recall_at_k(
    pred: DataFrame,
    gold: DataFrame,
    k: int,
    pred_col: str = "codes",
    gold_col: str = "gold_codes",
) -> DataFrame:
    """pred(mention key, codes array) x gold(mention key, gold_codes array)
    -> one row: p_at_k, r_at_k, acc_at_k, n (means over aligned mentions;
    alignment join on the offset key mirrors `evaluation.py:372-395`)."""
    j = pred.join(gold, MENTION_KEY, "inner")
    topk = F.slice(F.col(pred_col), 1, k)
    inter = F.size(F.array_intersect(topk, F.col(gold_col))).cast("double")
    p = inter / F.greatest(F.least(F.size(topk), F.lit(k)), F.lit(1)).cast("double")
    r = inter / F.greatest(F.size(F.col(gold_col)), F.lit(1)).cast("double")
    acc = (inter > 0).cast("double")
    return j.agg(
        F.avg(p).alias("p_at_k"),
        F.avg(r).alias("r_at_k"),
        F.avg(acc).alias("acc_at_k"),
        F.count(F.lit(1)).alias("n"),
    )


def micro_prf(
    pred_triples: DataFrame,
    gold_triples: DataFrame,
    keys: tuple[str, ...] = ("subj", "pred", "code"),
) -> dict[str, float]:
    """Micro precision/recall/F1 over exact key matches — the triples
    acceptance gate (evaluation.py:151-165 semantics without sklearn)."""
    p = pred_triples.select(*keys).dropDuplicates()
    g = gold_triples.select(*keys).dropDuplicates()
    tp = p.join(g, list(keys), "inner").count()
    np_, ng = p.count(), g.count()
    precision = tp / np_ if np_ else 0.0
    recall = tp / ng if ng else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": tp,
        "n_pred": np_,
        "n_gold": ng,
    }


def best_k_by_recall(metrics: DataFrame) -> int:
    """A11 (`evaluation.py:216-221`): pick k with max recall."""
    row = metrics.orderBy(F.desc("r_at_k"), F.asc("k")).limit(1).collect()[0]
    return int(row["k"])
