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
from .standin import MODEL_VERSION

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def run_extraction(pages: "DataFrame", lang: str = "ja") -> dict:
    annotations = infer.annotate_pages(pages, lang=lang)
    return {
        "annotations": annotations,
        "mentions": mentions_mod.mentions_from_annotations(annotations),
        "triples": mentions_mod.triples_from_annotations(annotations),
    }


def run_kg(
    pages: "DataFrame",
    concept_dict: "DataFrame",
    lang: str = "ja",
) -> dict:
    """Full knowledge-graph construction; returns all intermediate tables."""
    from .concepts import TAG2NAME

    ext = run_extraction(pages, lang=lang)
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
    links = link.link_surfaces(surfaces, concept_dict)
    concept_canon = canon.canonicalize_concepts(concept_dict)
    canonical = graph.canonical_triples(triples, links, concept_canon)
    return {**ext, "links": links, "concept_canon": concept_canon,
            "canonical_triples": canonical}


def run_with_lineage(
    spark: "SparkSession",
    pages: "DataFrame",
    concept_dict: "DataFrame",
    out_dir: str,
    n_buckets: int = 8,
    stage: str = "kg_triples",
    max_buckets: int | None = None,
) -> list[int]:
    """Bucket-wise run with lineage + resume (N6). Returns buckets processed.

    ``max_buckets`` caps work per invocation (used by the kill/resume test to
    simulate a mid-run crash).
    """
    todo = lineage.pending_buckets(spark, out_dir, stage, n_buckets)
    if max_buckets is not None:
        todo = todo[:max_buckets]
    bucketed = pages.withColumn("_bucket", lineage.bucket_of_url(n_buckets))
    for b in todo:
        subset = bucketed.where(F.col("_bucket") == b).drop("_bucket")
        result = run_kg(subset, concept_dict)
        out = result["canonical_triples"].persist()
        n_triples = out.count()
        stats = subset.agg(
            F.min("url").alias("lo"), F.max("url").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        # deterministic per-bucket overwrite -> idempotent on re-run
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, "data", f"bucket={b}")
        )
        out.unpersist()
        lineage.append_lineage_row(
            spark, out_dir, stage, b, stats["lo"], stats["hi"],
            MODEL_VERSION, stats["n"], n_triples,
        )
    return todo


def read_materialized(spark: "SparkSession", out_dir: str) -> "DataFrame":
    return spark.read.option("basePath", os.path.join(out_dir, "data")).parquet(
        os.path.join(out_dir, "data", "bucket=*")
    )
