"""End-to-end pipeline composition (SURVEY.md §3.2 Spark re-expression).

    pages -> annotate (one mapInPandas) -> mentions + triples
          -> link surfaces (N2/N3) -> canonicalize (N4)
          -> canonical triples -> materialize salted (N5) [+ lineage N6]

Each stage is a DataFrame -> DataFrame function; ``run_extraction`` /
``run_kg`` return the intermediate tables for tests and ad-hoc queries.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from . import canon, graph, infer, lineage, link, mentions as mentions_mod

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def run_extraction(
    pages: "DataFrame", lang: str = "ja", mode: str = "sentence"
) -> dict:
    annotations = infer.annotate_pages(pages, lang=lang, mode=mode)
    return {
        "annotations": annotations,
        "mentions": mentions_mod.mentions_from_annotations(annotations),
        "triples": mentions_mod.triples_from_annotations(annotations),
    }


def run_kg(
    pages: "DataFrame",
    concept_dict: "DataFrame",
    lang: str = "ja",
    checkpoint_dir: str | None = None,
    mode: str = "sentence",
    model_spec: str | None = None,
) -> dict:
    """Full knowledge-graph construction; returns all intermediate tables.

    Uses the flat Arrow-native hot path (infer.annotate_pages_flat): one
    mapInArrow stage emitting primitive-typed mention/triple rows. The nested
    annotations stage exists for parity outputs (CONLL/XML) and is not on
    this path.

    The inference stage feeds two downstream passes (surface discovery and
    the canonical join). With ``checkpoint_dir`` set, the stage lands as a
    parquet checkpoint and both passes read it back — the sandbox analog of
    the per-stage Iceberg checkpoint (N6), and ~3x cheaper than Spark's
    columnar in-memory cache for this row volume (measured: 17s write+reread
    vs 54s persist at 9.4M rows). Without a dir it falls back to persist().

    ``model_spec`` selects the extractor provider (``standin`` default,
    ``numpy:<dir>``, ``torch:<dir>``) — resolved driver-side and shipped by
    closure, same contract as infer.annotate_pages_flat.
    """
    from .concepts import TAG2NAME

    if checkpoint_dir is not None:
        spark = pages.sparkSession
        path = os.path.join(checkpoint_dir, "flat_annotations.parquet")
        infer.annotate_pages_flat(
            pages, lang=lang, mode=mode, model_spec=model_spec
        ).write.mode(
            "overwrite"
        ).parquet(path)
        flat = spark.read.parquet(path)
    else:
        flat = infer.annotate_pages_flat(
            pages, lang=lang, mode=mode, model_spec=model_spec
        ).persist()
    ext = {
        "annotations": flat,
        "mentions": mentions_mod.mentions_from_flat(flat),
        "triples": mentions_mod.triples_from_flat(flat),
    }
    triples = ext["triples"]
    tag2sem = F.create_map(
        *[F.lit(x) for pair in TAG2NAME.items() for x in pair]
    )
    surfaces = (
        triples.select(
            F.col("subj_surface").alias("surface"),
            tag2sem[F.col("subj_tag")].alias("sem_type"),
        )
        .union(
            triples.select(
                F.col("obj_surface").alias("surface"),
                tag2sem[F.col("obj_tag")].alias("sem_type"),
            )
        )
        .distinct()
    )
    if checkpoint_dir is None:
        # vocabulary-sized from here on: truncate the corpus-sized lineage so
        # the many small linking/rerank stages don't drag the full upstream
        # plan through re-optimization (measured 2x link latency otherwise).
        # With a parquet checkpoint the lineage is already short.
        surfaces = surfaces.localCheckpoint(eager=True)
    # links are consumed twice (subj + obj resolution) as broadcast sides;
    # materialize once (vocabulary-sized) so the whole linking subtree isn't
    # inlined into both broadcast builds. materialize=False: surfaces are
    # already checkpoint-backed here, so link_surfaces must not add its own
    # persist (it would leak one cache entry per run_kg call — found by
    # review in the foreachBatch/per-bucket loops).
    links = link.link_surfaces(
        surfaces, concept_dict, materialize=False
    ).localCheckpoint(eager=True)
    concept_canon = canon.canonicalize_concepts(concept_dict)
    canonical = graph.canonical_triples(triples, links, concept_canon)
    cached = [flat] if checkpoint_dir is None else []
    return {**ext, "links": links, "concept_canon": concept_canon,
            "canonical_triples": canonical, "_cached": cached}


def release(result: dict) -> None:
    """Unpersist everything a run_kg result pinned (call once per micro-batch
    / bucket in long-running loops; checkpoint blocks are freed by the
    context cleaner when the returned DataFrames go out of scope)."""
    for df in result.get("_cached", []):
        try:
            df.unpersist()
        except Exception:
            pass


def run_with_lineage(
    spark: "SparkSession",
    pages: "DataFrame",
    concept_dict: "DataFrame",
    out_dir: str,
    n_buckets: int = 8,
    stage: str = "kg_triples",
    max_buckets: int | None = None,
    lang: str = "ja",
    parallel_buckets: int = 1,
) -> list[int]:
    """Bucket-wise run with lineage + resume (N6). Returns buckets processed.

    Resume is keyed on (stage, bucket, model_version) — swapping the model
    via JAMIE_MODEL invalidates completions of the previous model.
    ``max_buckets`` caps work per invocation (used by the kill/resume test to
    simulate a mid-run crash).

    ``parallel_buckets`` > 1 overlaps bucket runs via driver threads (Spark
    schedules concurrent jobs fairly). Per-bucket lineage atomicity is
    unchanged: each bucket still writes its own data directory
    (deterministic overwrite) BEFORE appending its own lineage row; the
    append itself is serialized by a driver lock (concurrent appends to one
    parquet dir share the _temporary staging dir and clobber). Sequential
    remains the default — at real scale one bucket saturates the cluster
    and sequential is the right resume granularity; parallelism pays when
    buckets are small relative to the cluster.
    """
    from .models import model_version

    mv = model_version()
    todo = lineage.pending_buckets(
        spark, out_dir, stage, n_buckets, model_version=mv
    )
    if max_buckets is not None:
        todo = todo[:max_buckets]
    bucketed = pages.withColumn("_bucket", lineage.bucket_of_url(n_buckets))

    def _run_bucket(b: int) -> None:
        subset = bucketed.where(F.col("_bucket") == b).drop("_bucket")
        result = run_kg(subset, concept_dict, lang=lang)
        out = result["canonical_triples"].persist()
        n_triples = out.count()
        # a second pass over the source, but column-pruned by design: the
        # agg touches only `url` (and the bucket filter is a function of
        # url), so a columnar source reads one thin column, never the html
        # payload. Deriving these stats from the persisted annotations
        # would silently drop no-sentence pages from row_count.
        stats = subset.agg(
            F.min("url").alias("lo"), F.max("url").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        # deterministic per-bucket overwrite -> idempotent on re-run
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, "data", f"bucket={b}")
        )
        out.unpersist()
        release(result)
        lineage.append_lineage_row(
            spark, out_dir, stage, b, stats["lo"], stats["hi"],
            mv, stats["n"], n_triples, n_buckets=n_buckets,
        )

    if parallel_buckets <= 1:
        for b in todo:
            _run_bucket(b)
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=parallel_buckets) as pool:
            # list() drains the iterator so the first failure propagates
            list(pool.map(_run_bucket, todo))
    return todo


def read_materialized(spark: "SparkSession", out_dir: str) -> "DataFrame":
    return spark.read.option("basePath", os.path.join(out_dir, "data")).parquet(
        os.path.join(out_dir, "data", "bucket=*")
    )
