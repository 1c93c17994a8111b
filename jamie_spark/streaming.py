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

Checkpointing: each query gets a ``checkpointLocation``; combined with the
engine's idempotent per-bucket writes (lineage, N6) a crashed stream resumes
without duplicates.
"""

from __future__ import annotations

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


def stream_kg(
    pages_stream: "DataFrame",
    concept_dict: "DataFrame",
    out_dir: str,
    checkpoint_dir: str,
) -> "StreamingQuery":
    """Stream pages -> canonical triples, one micro-batch at a time.

    ``foreachBatch`` reuses the exact batch pipeline (run_kg), so streaming
    and batch can never drift semantically; output appends parquet
    partitioned the same way as the batch materializer.
    """

    def process(batch_df: "DataFrame", batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = pipeline.run_kg(batch_df, concept_dict)
        from . import graph

        (
            graph.salted(result["canonical_triples"], n_buckets=8, n_salts=4)
            .write.mode("append")
            .parquet(out_dir)
        )
        pipeline.release(result)

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
