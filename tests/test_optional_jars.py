"""Env-gated tests for the first-choice jar-backed paths (GraphFrames
connected components, Iceberg graph sink + snapshot streaming source).

This sandbox ships neither jar and has no network, so these SKIP here —
they exist so a jar-equipped deployment validates the preferred paths with
zero code change. Activation (pyspark 4.x / Scala 2.13):

    spark-submit \
      --packages io.graphframes:graphframes-spark4_2.13:0.9.3,\
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.local.type=hadoop \
      --conf spark.sql.catalog.local.warehouse=/tmp/iceberg_wh \
      ...

plus ``pip install graphframes-py`` for the GraphFrames python wrapper.
"""

import pytest

from jamie_spark import canon, graph


def _has_graphframes(spark) -> bool:
    return canon._graphframes_available(spark)


def _has_iceberg(spark) -> bool:
    return graph.iceberg_available(spark)


def test_graphframes_components_match_union_find(spark):
    if not _has_graphframes(spark):
        pytest.skip("graphframes jar/python package not on this classpath")
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "src string, dst string"
    )
    # small_graph_edges=0 skips the driver union-find, so the GraphFrames
    # branch (canon.connected_components' first distributed choice) runs
    got = {
        r["vertex"]: r["component"]
        for r in canon.connected_components(edges, small_graph_edges=0).collect()
    }
    assert set(got) == {"a", "b", "c", "x", "y"}
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] != got["a"]


@pytest.fixture()
def iceberg_catalog(spark, tmp_path):
    if not _has_iceberg(spark):
        pytest.skip("iceberg-spark-runtime jar not on this classpath")
    # Iceberg catalogs resolve lazily, so runtime conf is enough
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    return "it"


def test_iceberg_materialize_roundtrip(spark, iceberg_catalog):
    from pyspark.sql import functions as F

    triples = spark.range(100).select(
        F.concat(F.lit("S"), (F.col("id") % 7).cast("string")).alias("subj_id"),
        F.lit("P").alias("pred"),
        F.col("id").cast("string").alias("obj_id"),
    )
    tbl = f"{iceberg_catalog}.db.triples"
    graph.materialize(triples, path="", n_buckets=4, n_salts=2, table=tbl)
    back = spark.read.format("iceberg").load(tbl)
    assert back.count() == 100
    assert back.select(F.max("bucket")).first()[0] < 4
    # overwrite idempotence, same contract as the parquet sink
    graph.materialize(triples, path="", n_buckets=4, n_salts=2, table=tbl)
    assert spark.read.format("iceberg").load(tbl).count() == 100


def test_iceberg_readstream_snapshots(spark, iceberg_catalog, tmp_path):
    from jamie_spark import fixtures, streaming

    tbl = f"{iceberg_catalog}.db.pages"
    fixtures.pages_df(spark, 20, seed=3).writeTo(tbl).using(
        "iceberg"
    ).createOrReplace()
    stream = streaming.read_page_stream_iceberg(spark, tbl)
    q = (
        stream.writeStream.format("memory")
        .queryName("it_pages")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT COUNT(*) FROM it_pages").first()[0] == 20
