"""Per-partition lineage + idempotent resume (N6).

Every pipeline run processes the corpus in url-hash buckets. Each completed
bucket appends (atomically, via parquet append of a single small file) one
lineage row:

    (stage, bucket, url_min, url_max, model_version, row_count, triple_count,
     completed_at)

Resume = anti-join of the full bucket list against completed lineage rows —
only pending buckets are (re)computed, so a killed run re-executes at most one
bucket of work. On Iceberg the same design keys lineage rows to snapshot ids;
parquet append gives the sandbox equivalent (a bucket's data file lands before
its lineage row, so a crash between the two re-runs that bucket — idempotent
because the data write for a bucket is a deterministic overwrite of that
bucket's directory).
"""

from __future__ import annotations

import os
import threading
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

LINEAGE_DDL = (
    "stage string, bucket int, url_min string, url_max string, "
    "model_version string, row_count long, triple_count long, "
    "completed_at timestamp"
)


def lineage_path(base: str) -> str:
    return os.path.join(base, "_lineage")


def read_lineage(spark: "SparkSession", base: str) -> "DataFrame":
    path = lineage_path(base)
    try:
        return spark.read.schema(LINEAGE_DDL).parquet(path)
    except Exception:
        return spark.createDataFrame([], schema=LINEAGE_DDL)


def pending_buckets(
    spark: "SparkSession",
    base: str,
    stage: str,
    n_buckets: int,
    model_version: str | None = None,
) -> list[int]:
    """Buckets not yet completed for (stage, model_version).

    Keying on model_version means swapping the model (JAMIE_MODEL) correctly
    invalidates prior completions instead of silently skipping them.
    """
    lin = read_lineage(spark, base).where(F.col("stage") == stage)
    if model_version is not None:
        lin = lin.where(F.col("model_version") == model_version)
    done = {r["bucket"] for r in lin.select("bucket").distinct().collect()}
    return [b for b in range(n_buckets) if b not in done]


#: concurrent parquet appends to ONE directory share the _temporary/0
#: staging dir (FileOutputCommitter) and clobber each other — serialize
#: lineage appends across the driver's bucket threads. Bucket DATA writes
#: need no lock (each bucket overwrites its own directory).
_APPEND_LOCK = threading.Lock()


def append_lineage_row(
    spark: "SparkSession",
    base: str,
    stage: str,
    bucket: int,
    url_min: str,
    url_max: str,
    model_version: str,
    row_count: int,
    triple_count: int,
) -> None:
    row = [
        {
            "stage": stage,
            "bucket": bucket,
            "url_min": url_min,
            "url_max": url_max,
            "model_version": model_version,
            "row_count": row_count,
            "triple_count": triple_count,
        }
    ]
    with _APPEND_LOCK:
        (
            spark.createDataFrame(row, schema=LINEAGE_DDL.rsplit(",", 1)[0])
            .withColumn("completed_at", F.current_timestamp())
            .coalesce(1)
            .write.mode("append")
            .parquet(lineage_path(base))
        )


def bucket_of_url(n_buckets: int):
    return F.pmod(F.xxhash64("url"), F.lit(n_buckets))
