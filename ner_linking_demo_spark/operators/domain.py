"""Per-domain document capping — the standard web-corpus curation step
(C4/Gopher-style) that stops a handful of giant hosts from dominating a
pretraining mix.

Reference scope note: the reference pipeline (guilopgar/ner-linking-demo)
has no corpus-curation layer at all; this operator belongs to the
training-data extensions (SURVEY.md §2.11) alongside dedup and packing.

Two strategies, chosen by the caller:

- ``exact`` — row_number over a (domain) window ordered by a
  cross-engine-stable key (md5(url), url), keep rank <= cap. ONE shuffle
  on domain. Deterministic and DuckDB-oracle-able, but a hot domain
  (e.g. a crawl where one host is 10% of all pages) concentrates its
  whole partition on one task: at 100 TB the window sort on that task is
  the straggler.
- ``approx`` — two passes, no window, no skew: (1) tiny count-per-domain
  aggregate (map-side partial, rows = |domains|), (2) broadcast the
  OVER-CAP domains only (the small set by construction) and keep a row
  when ``pmod(xxhash64(url), count) < cap``. Every row is decided
  independently from the scan — no per-domain sort, no concentration.
  Keeps cap docs per over-capped domain IN EXPECTATION (binomial around
  cap; exact only when the hash were perfectly uniform) — the honest
  trade for removing the skew bottleneck, and the form that survives a
  1000-executor cluster with a pathological host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_domain(url) -> F.Column:
    """Lowercased host with a leading ``www.`` stripped; '' for urls with
    no ``scheme://host`` shape. Userinfo (``user[:pass]@``) is skipped so
    ``https://token@spam.example.com/p`` attributes to the real host
    instead of minting a fresh pseudo-domain per token. Pure Catalyst
    (regexp on the scan)."""
    host = F.lower(
        F.regexp_extract(
            url,
            r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)",
            1,
        )
    )
    return F.regexp_replace(host, r"^www\.", "")


def cap_per_domain(
    docs: DataFrame,
    cap: int,
    url_col: str = "url",
    strategy: str = "exact",
    domain_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep at most ``cap`` documents per registered host (exact) or
    ~``cap`` in expectation (approx — see module docstring for the skew
    rationale). Output carries the input columns plus ``domain``.

    Rows whose domain cannot be established (NULL or unparseable url)
    are EXEMPT from capping in both strategies: capping is a per-host
    rule, and unattributable docs have no host — dropping them under a
    shared pseudo-domain would discard unrelated content by accident
    (content floods among them are the dedup stage's job). Both
    strategies agree on this, so swapping strategy never changes which
    population is subject to the cap.

    ``domain_col`` reuses an existing domain column instead of deriving
    one from ``url_col``. ``tiebreak_col`` (e.g. a doc id) extends the
    exact strategy's ordering key — REQUIRED for determinism when the
    same url can appear on multiple rows (re-crawls before exact dedup);
    with unique urls the (md5(url), url) key is already total.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    if strategy not in ("exact", "approx"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    if domain_col is None:
        d = docs.withColumn("domain", extract_domain(F.col(url_col)))
    else:
        d = docs.withColumn("domain", F.col(domain_col))
    capped = F.col("domain").isNotNull() & (F.col("domain") != "")

    if strategy == "exact":
        order = [F.md5(F.col(url_col)), F.col(url_col)]
        if tiebreak_col is not None:
            order.append(F.col(tiebreak_col))
        w = Window.partitionBy("domain").orderBy(*order)
        return (
            d.withColumn("_rk", F.row_number().over(w))
            .filter(~capped | (F.col("_rk") <= cap))
            .drop("_rk")
        )

    counts = d.filter(capped).groupBy("domain").agg(F.count("*").alias("_n"))
    over = counts.filter(F.col("_n") > cap)
    joined = d.join(F.broadcast(over), "domain", "left")
    return joined.filter(
        F.col("_n").isNull()
        | (F.pmod(F.xxhash64(F.col(url_col)), F.col("_n")) < cap)
    ).drop("_n")


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
    top_k: int | None = None,
) -> DataFrame:
    """(domain, n_docs[, total_chars]) per host, heaviest first — the
    diagnostic that decides whether capping is needed and at what level.
    Map-side partial aggregate; output rows = |domains|. ``total_chars``
    is included only when ``text_col`` names a present column."""
    d = docs.withColumn("domain", extract_domain(F.col(url_col)))
    aggs = [F.count("*").alias("n_docs")]
    if text_col is not None and text_col in docs.columns:
        aggs.append(F.sum(F.length(text_col)).alias("total_chars"))
    out = d.groupBy("domain").agg(*aggs).orderBy(F.desc("n_docs"), "domain")
    return out.limit(top_k) if top_k is not None else out
