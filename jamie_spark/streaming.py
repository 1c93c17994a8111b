"""Structured Streaming ingest (N7, SURVEY.md §2.7 — optional axis).

The reference is batch-only; the north_rule requires batch + resumability,
so streaming here is a thin composition layer, not a new engine: incremental
crawl drops (new page files landing in a directory / new Iceberg snapshots)
stream through the SAME batch stages via ``foreachBatch`` — one code path for
batch and streaming, which is the idiomatic Spark design. State is bounded:

* triple extraction is stateless per page -> plain ``foreachBatch`` append;
* the only stateful operator is the windowed crawl-rate aggregation, which
  uses an event-time watermark on ``warc_ts`` so late pages are bounded and
  state is dropped deterministically.

Checkpointing: each query gets a ``checkpointLocation``. ``foreachBatch`` is
at-least-once by itself — a crash after the sink write but before the
checkpoint commit replays the micro-batch on restart — so the sink must be
idempotent on ``batch_id``: each micro-batch lands in its own
``out_dir/batch={batch_id}`` partition with ``mode("overwrite")``, making the
replay overwrite the partial output instead of duplicating it (the same
deterministic-overwrite pattern the lineage writer uses per bucket). The
combination (replayable source + batch-keyed overwrite sink) gives
effectively-exactly-once output.
"""

from __future__ import annotations

import os
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from . import pipeline
from .fixtures import PAGES_DDL

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.streaming import StreamingQuery


def read_page_stream(
    spark: "SparkSession", input_dir: str, max_files_per_trigger: int = 4
) -> "DataFrame":
    """Incremental crawl batches: parquet files landing in ``input_dir``.

    On a real lake this is ``readStream.format("iceberg")`` over snapshot
    appends; the file source has identical semantics for the sandbox.
    """
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def process_kg_batch(
    batch_df: "DataFrame", batch_id: int, concept_dict: "DataFrame", out_dir: str
) -> None:
    """One micro-batch: pages -> canonical triples -> batch-keyed overwrite.

    Module-level (not a closure) so the idempotence contract is directly
    testable: calling this twice with the same ``batch_id`` — the replay a
    crash between sink write and checkpoint commit produces — must leave the
    same rows as calling it once (``mode("overwrite")`` into the batch's own
    partition directory).
    """
    if batch_df.isEmpty():
        return
    result = pipeline.run_kg(batch_df, concept_dict)
    from . import graph

    (
        graph.salted(result["canonical_triples"], n_buckets=8, n_salts=4)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, f"batch={batch_id}"))
    )
    pipeline.release(result)


def read_stream_output(spark: "SparkSession", out_dir: str) -> "DataFrame":
    """Read the batch-partitioned stream output back as one table."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, "batch=*")
    )


def stream_kg(
    pages_stream: "DataFrame",
    concept_dict: "DataFrame",
    out_dir: str,
    checkpoint_dir: str,
) -> "StreamingQuery":
    """Stream pages -> canonical triples, one micro-batch at a time.

    ``foreachBatch`` reuses the exact batch pipeline (run_kg), so streaming
    and batch can never drift semantically; each micro-batch overwrites its
    own ``batch={batch_id}`` partition (idempotent on replay — see module
    docstring), laid out the same way as the batch materializer.
    """

    def process(batch_df: "DataFrame", batch_id: int) -> None:
        process_kg_batch(batch_df, batch_id, concept_dict, out_dir)

    return (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def crawl_rate(
    pages_stream: "DataFrame",
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> "DataFrame":
    """Watermarked tumbling-window page counts per lang (the one stateful op).

    Late pages beyond the watermark are dropped deterministically — bounded
    state at any corpus rate.
    """
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
