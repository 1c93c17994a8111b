"""Mentions + triples as first-class DataFrames (B3 / mention-triplets).

annotations (one row per sentence, nested arrays)
  -> mentions(url, sent_id, begin_tok, end_tok, ner_tag, mod_tag, surface, tid)
  -> triples(url, sent_id, subj_surface, pred, obj_surface, ...)

The heavy decode already happened inside the inference stage
(jamie_spark.infer); here it's pure JVM-side ``posexplode`` — no Python, no
shuffle (explode is a narrow transformation). ``tid`` reproduces the
reference's document-order T{n} numbering (``data_objects.py:272-277``) with a
window over (url) ordered by (sent_id, begin) — the only window in the
front-end, partitioned by url so it scales with document count.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def mentions_from_annotations(annotations: "DataFrame") -> "DataFrame":
    """Explode per-sentence entity arrays into a mentions table (B1+B3)."""
    m = annotations.select(
        "url",
        "sent_id",
        F.explode("entities").alias("e"),
    ).select(
        "url",
        "sent_id",
        F.col("e.begin").alias("begin_tok"),
        F.col("e.end").alias("end_tok"),
        F.col("e.tag").alias("ner_tag"),
        F.col("e.mod").alias("mod_tag"),
        F.col("e.surface").alias("surface"),
    )
    w = Window.partitionBy("url").orderBy("sent_id", "begin_tok")
    return m.withColumn("tid", F.concat(F.lit("T"), F.row_number().over(w)))


def mentions_from_flat(flat: "DataFrame") -> "DataFrame":
    """Flat hot-path rows (kind='m') -> mentions table with document-order tid."""
    m = flat.where(F.col("kind") == "m").select(
        "url",
        "sent_id",
        F.col("begin").alias("begin_tok"),
        F.col("end").alias("end_tok"),
        F.col("tag").alias("ner_tag"),
        F.col("mod").alias("mod_tag"),
        "surface",
    )
    w = Window.partitionBy("url").orderBy("sent_id", "begin_tok")
    return m.withColumn("tid", F.concat(F.lit("T"), F.row_number().over(w)))


def triples_from_flat(flat: "DataFrame") -> "DataFrame":
    """Flat hot-path rows (kind='t') -> triples table (mention-triplet shape)."""
    return flat.where(F.col("kind") == "t").select(
        "url",
        "sent_id",
        F.col("surface").alias("subj_surface"),
        F.col("rel").alias("pred"),
        F.col("obj_surface").alias("obj_surface"),
        F.col("tag").alias("subj_tag"),
        F.col("obj_tag").alias("obj_tag"),
        F.col("mod").alias("subj_mod"),
    )


def triples_from_annotations(annotations: "DataFrame") -> "DataFrame":
    """Explode per-sentence triple arrays (mention-triplet semantics,
    reference data_objects.py:251-265)."""
    return annotations.select(
        "url",
        "sent_id",
        F.explode("triples").alias("t"),
    ).select(
        "url",
        "sent_id",
        F.col("t.tail_surface").alias("subj_surface"),
        F.col("t.rel").alias("pred"),
        F.col("t.head_surface").alias("obj_surface"),
        F.col("t.tail_tag").alias("subj_tag"),
        F.col("t.head_tag").alias("obj_tag"),
        F.col("t.tail_mod").alias("subj_mod"),
    )
