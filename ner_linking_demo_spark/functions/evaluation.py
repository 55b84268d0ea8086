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


def _at_k_exprs(k: int, pred_col: str, gold_col: str):
    """Per-mention (p, r, acc) column expressions — THE metric
    definition, shared by precision_recall_at_k and split_metrics so the
    'all' stratum of the split report can never drift from the unsplit
    report."""
    topk = F.slice(F.col(pred_col), 1, k)
    inter = F.size(F.array_intersect(topk, F.col(gold_col))).cast("double")
    p = inter / F.greatest(
        F.least(F.size(topk), F.lit(k)), F.lit(1)
    ).cast("double")
    r = inter / F.greatest(F.size(F.col(gold_col)), F.lit(1)).cast("double")
    acc = (inter > 0).cast("double")
    return p, r, acc


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
    p, r, acc = _at_k_exprs(k, pred_col, gold_col)
    return j.agg(
        F.avg(p).alias("p_at_k"),
        F.avg(r).alias("r_at_k"),
        F.avg(acc).alias("acc_at_k"),
        F.count(F.lit(1)).alias("n"),
    )


def split_metrics(
    pred: DataFrame,
    gold: DataFrame,
    train_mentions: DataFrame,
    train_codes: DataFrame,
    k: int,
    pred_col: str = "codes",
    gold_col: str = "gold_codes",
    mention_col: str = "span",
) -> DataFrame:
    """Stratified P@k / R@k / Acc@k by whether the mention surface form
    and the gold code(s) were seen in training.

    Reference parity: `server/linking/src/utils/evaluation.py:488-543`
    (`eval_gs_preds` / `eval_gs_preds_at_k`) scores the full gold
    standard plus two pre-filtered subsets — unseen mentions and unseen
    codes — prepared upstream of the repo. Here the stratification is
    computed in-frame from a training vocabulary, so one call returns
    the reference's three report rows (and their seen complements):

    - ``train_mentions(term)``: surface forms seen in training; a
      mention is *seen* when its lowercased trimmed surface matches.
    - ``train_codes(code)``: codes seen in training; a mention is
      *seen-code* when EVERY gold code is in the training set (any
      unseen gold code puts the mention in the unseen_code stratum —
      that is the stratum the split exists to isolate: can the linker
      rank a code it never trained on).

    Output: one row per stratum in {all, seen_mention, unseen_mention,
    seen_code, unseen_code} with (split, p_at_k, r_at_k, acc_at_k, n).
    Empty strata emit no row (mean of nothing is undefined, not 0).

    Scale posture: both vocabularies are dimension-sized -> broadcast
    joins riding the mention-scale frame; the only exchange is the final
    groupBy over 5 stratum keys (gold-code membership is checked with a
    HOF over the broadcast-collected code set — no explode+regroup of
    the mention frame).
    """
    j = pred.join(gold, MENTION_KEY, "inner")
    norm = F.lower(F.trim(F.col(mention_col)))

    tm = train_mentions.select(
        F.lower(F.trim(F.col("term"))).alias("_tm_term")
    ).dropDuplicates()
    j = j.join(
        F.broadcast(tm), norm == F.col("_tm_term"), "left"
    ).withColumn("_mention_seen", F.col("_tm_term").isNotNull())

    tc = train_codes.select(
        F.col("code").cast("string").alias("_tc_code")
    ).dropDuplicates()
    j = j.join(
        F.broadcast(tc.groupBy().agg(
            F.collect_set("_tc_code").alias("_tc_codes")
        )),
        how="cross",
    ).withColumn(
        "_code_seen",
        F.forall(
            F.col(gold_col),
            lambda c: F.array_contains(F.col("_tc_codes"), c),
        ),
    )

    p, r, acc = _at_k_exprs(k, pred_col, gold_col)

    per_mention = j.select(
        p.alias("_p"),
        r.alias("_r"),
        acc.alias("_acc"),
        F.array(
            F.lit("all"),
            F.when(F.col("_mention_seen"), F.lit("seen_mention")).otherwise(
                F.lit("unseen_mention")
            ),
            F.when(F.col("_code_seen"), F.lit("seen_code")).otherwise(
                F.lit("unseen_code")
            ),
        ).alias("_splits"),
    )
    return (
        per_mention.select(
            F.explode("_splits").alias("split"), "_p", "_r", "_acc"
        )
        .groupBy("split")
        .agg(
            F.avg("_p").alias("p_at_k"),
            F.avg("_r").alias("r_at_k"),
            F.avg("_acc").alias("acc_at_k"),
            F.count(F.lit(1)).alias("n"),
        )
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
