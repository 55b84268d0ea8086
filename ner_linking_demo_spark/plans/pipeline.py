"""The end-to-end KG-construction plan:

    pages --(NER UDF)--> mentions --(embed+kNN+W3)--> linked
          --(alias CC)--> entities/code2entity
          --(materialize)--> triples + edges

Each arrow is a checkpointed stage (plans/catalog.py): killed runs resume
from the last published snapshot without recomputation; every stage logs
per-partition lineage counters. This is the Spark collapse of the
reference's three-process Flask/Celery/Mongo lifecycle (SURVEY.md §3.1):
the whole service path becomes one spark-submit driver program.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embedder import HashEmbedder
from ..sources.embeddings_cache import gaz_content_hash
from ..operators.linking import build_indexes, detect_and_link, link_mentions
from ..operators.ner import detect_mentions
from ..operators.triples import build_entities_local, build_triples
from .catalog import CheckpointCatalog


@dataclass
class PipelineResult:
    mentions: DataFrame
    linked: DataFrame
    entities: DataFrame
    triples: DataFrame
    edges: DataFrame
    observations: dict = None

    def metrics(self) -> dict[str, int]:
        """Runtime row counters for the FUSED (no-checkpoint) plan,
        collected by CollectMetrics observations riding the triples
        action — zero extra jobs. Valid after any action on ``triples``
        (checkpointed runs get richer per-partition counters from the
        catalog lineage instead)."""
        if not self.observations:
            return {}
        return {
            name: int(obs.get["n"]) for name, obs in self.observations.items()
        }


def _sig(*parts) -> str:
    return "|".join(str(p) for p in parts)


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    gazetteer_pdf: pd.DataFrame,
    k: int = 3,
    checkpoint_dir: str | None = None,
    embedder: HashEmbedder | None = None,
    num_partitions: int | None = None,
    input_sig: str | None = None,
    reranker: str | None = None,
    from_html: bool = False,
    checkpoint_granularity: str = "fine",
) -> PipelineResult:
    """Run pages -> triples. When ``checkpoint_dir`` is set, every stage is
    snapshot-checkpointed and resumable; otherwise the plan runs fully lazy
    (single Catalyst plan, useful for benchmarking raw throughput).

    ``input_sig`` identifies the input for resume purposes (e.g. the source
    table's snapshot id); defaults to a shape-based signature.

    ``from_html=True`` derives ``text`` from the ``html`` column with the
    native byte-exact extractor (functions/html_extract.py) — for inputs
    where only the raw page bytes are populated. Extraction runs inside
    the scan projection (whole-stage codegen), so it adds no stage.

    ``checkpoint_granularity`` trades lineage detail for throughput when
    checkpointing is on: ``'fine'`` (default) checkpoints mention and
    exploded-candidate stages separately (candidate-grain lineage,
    skew-visible, restart loses at most one stage); ``'coarse'`` runs
    the FUSED pages->linked plan as a single checkpointed stage — one
    python pass and one snapshot instead of two of each, a measured
    ~2x of the fine mode's stage cost, for pipelines where per-stage
    forensics matter less than wall clock. Resume semantics are
    identical (same signature algebra).
    """
    if from_html:
        from ..functions.html_extract import extract_text_expr

        # extraction failures yield NULL text; drop them at the boundary
        # (count them with verify_text_fidelity / an observe() if needed)
        pages = pages.withColumn(
            "text", extract_text_expr("html")
        ).filter(F.col("text").isNotNull())
    embedder = embedder or HashEmbedder()
    # Content hash, not row count: editing a term/code/tag without changing
    # the row count must invalidate every dependent snapshot.
    gaz_sig = f"gaz{gaz_content_hash(gazetteer_pdf)[:16]}"
    # Embedder identity: resuming with a different embedding space must
    # recompute linked/triples/edges (same stale-resume class as the
    # gazetteer/reranker signatures).
    emb_sig = (
        f"emb{type(embedder).__name__}"
        f"d{getattr(embedder, 'dim', '?')}s{getattr(embedder, 'seed', '?')}"
    )
    if checkpoint_granularity not in ("fine", "coarse"):
        raise ValueError(
            f"unknown checkpoint_granularity {checkpoint_granularity!r} "
            "(expected 'fine' or 'coarse')"
        )
    if checkpoint_granularity == "coarse" and reranker is not None:
        # the fused plan has no reranking stage; resuming a coarse
        # snapshot as if reranking ran would be silently wrong
        raise ValueError(
            "checkpoint_granularity='coarse' does not support a reranker; "
            "use the default fine granularity"
        )
    input_sig = input_sig or _sig("pages", pages.schema.simpleString())
    cat = (
        CheckpointCatalog(spark, checkpoint_dir) if checkpoint_dir else None
    )

    observations = None
    indexes = build_indexes(gazetteer_pdf, k=k, embedder=embedder)

    # entities/code2entity depend ONLY on the gazetteer (dimension-sized,
    # driver-built) — on checkpointed runs their snapshot writes are
    # submitted NOW so they overlap the python-heavy mentions/linked
    # stages (guide §2.6: actions are only sequential because driver
    # code calls them sequentially); each write is a tiny job that
    # back-fills executors the Arrow/python phases leave idle. Resume
    # semantics unchanged: same tables, same signatures — only the
    # submission order moves.
    entities_df, code2entity = build_entities_local(spark, gazetteer_pdf)
    ent_pool = f_ent = f_c2e = None
    if cat:
        from concurrent.futures import ThreadPoolExecutor

        ent_pool = ThreadPoolExecutor(max_workers=2)
        f_ent = ent_pool.submit(
            cat.stage, "entities", _sig(gaz_sig), lambda: entities_df
        )
        f_c2e = ent_pool.submit(
            cat.stage, "code2entity", _sig(gaz_sig), lambda: code2entity
        )

    if cat and checkpoint_granularity == "coarse":
        # single fused python pass, single snapshot: the resumable mode
        # for throughput-bound runs (lineage is linked-grain, not
        # candidate-grain)
        linked = cat.stage(
            "linked",
            _sig(input_sig, gaz_sig, k, reranker, emb_sig, "coarse"),
            lambda: detect_and_link(
                pages,
                gazetteer_pdf,
                indexes,
                k=k,
                embedder=embedder,
                num_partitions=num_partitions,
            ),
        )
        mentions = linked.select("url", "label", "start", "end", "span")
    elif cat:
        # checkpointed runs keep separate, resumable stages with the
        # exploded-candidate linking plan (skew-visible, candidate-grain
        # lineage)
        mentions = cat.stage(
            "mentions",
            _sig(input_sig, gaz_sig),
            lambda: detect_mentions(
                pages, gazetteer_pdf, num_partitions=num_partitions
            ),
        )
        linked = cat.stage(
            "linked",
            _sig(input_sig, gaz_sig, k, reranker, emb_sig),
            lambda: link_mentions(
                mentions, indexes, k=k, embedder=embedder, reranker=reranker
            ),
        )
    elif reranker is None:
        # throughput plan: pages -> linked in ONE python UDF stage;
        # counters ride the plan as CollectMetrics observations (the
        # north-rule metrics requirement without a lineage-taxing job)
        from pyspark.sql import Observation

        observations = {
            "pages_in": Observation(),
            "linked_out": Observation(),
        }
        pages = pages.observe(
            observations["pages_in"], F.count(F.lit(1)).alias("n")
        )
        linked = detect_and_link(
            pages,
            gazetteer_pdf,
            indexes,
            k=k,
            embedder=embedder,
            num_partitions=num_partitions,
        ).observe(observations["linked_out"], F.count(F.lit(1)).alias("n"))
        mentions = linked.select("url", "label", "start", "end", "span")
    else:
        mentions = detect_mentions(
            pages, gazetteer_pdf, num_partitions=num_partitions
        )
        linked = link_mentions(
            mentions, indexes, k=k, embedder=embedder, reranker=reranker
        )

    if cat:
        # Resolve the entities/code2entity snapshots submitted before
        # the mentions stage (overlapped with the python-heavy
        # stages), then run the triples/edges pair concurrently: both
        # derive from the already-published linked snapshot and share
        # no data dependency, so one pair member's write back-fills
        # executors left idle by the other's commit tail (guide §2.6).
        # A kill mid-pair leaves at most two recomputable stages.
        from concurrent.futures import ThreadPoolExecutor

        entities_df = f_ent.result()
        code2entity = f_c2e.result()
        ent_pool.shutdown()
        triples, edges = build_triples(linked, code2entity)
        der_sig = _sig(input_sig, gaz_sig, k, reranker, emb_sig)
        # reranker is part of the signature: triples/edges derive from
        # the 'linked' stage, so their snapshots must invalidate with it.
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_tri = pool.submit(
                cat.stage, "triples", der_sig, lambda: triples
            )
            f_edg = pool.submit(cat.stage, "edges", der_sig, lambda: edges)
            triples = f_tri.result()
            edges = f_edg.result()
    else:
        triples, edges = build_triples(linked, code2entity)

    return PipelineResult(
        mentions=mentions,
        linked=linked,
        entities=entities_df,
        triples=triples,
        edges=edges,
        observations=observations,
    )


def verify_invariants(result: PipelineResult) -> dict[str, int]:
    """The reference's runtime asserts as validation queries (SURVEY.md §5.1):
    returns violation counts (all must be 0)."""
    dup_mentions = (
        result.mentions.groupBy("url", "start", "end", "label")
        .count()
        .filter("count > 1")
        .count()
    )
    empty_span = result.mentions.filter(F.length("span") == 0).count()
    bad_offsets = result.mentions.filter("start >= end").count()
    dup_edges = (
        result.edges.groupBy("src", "rel", "dst").count().filter("count > 1").count()
    )
    return {
        "dup_mention_keys": dup_mentions,
        "empty_spans": empty_span,
        "bad_offsets": bad_offsets,
        "dup_edges": dup_edges,
    }
