"""BM25 search + deterministic hash sampling semantics."""

from pyspark.sql import functions as F

from jamie_spark import search, textstats


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_ranking_semantics(spark):
    docs = _docs(spark, [
        "spark spark spark filler filler filler",   # high tf
        "spark filler filler filler filler filler", # low tf
        "filler filler filler filler filler filler",# no match -> absent
        "spark",                                    # short doc: length norm boost
    ])
    rows = {r["doc_id"]: r["score"] for r in
            search.bm25_scores(docs, ("spark",)).collect()}
    assert set(rows) == {0, 1, 3}          # non-matching doc excluded
    assert rows[0] > rows[1]               # tf saturation still monotone
    assert rows[3] > rows[1]               # shorter doc outranks at equal tf
    assert all(s > 0 for s in rows.values())


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 of 10 docs, 'common' in all 10 -> idf dominates
    texts = [f"common w{i}" for i in range(9)] + ["common rare"]
    docs = _docs(spark, texts)
    scores = {r["doc_id"]: r["score"] for r in
              search.bm25_scores(docs, ("common", "rare")).collect()}
    assert scores[9] > max(scores[i] for i in range(9))


def test_search_topk_deterministic_ties(spark):
    docs = _docs(spark, ["x y"] * 5 + ["z"])
    top = search.search_topk(docs, ("x",), k=3).collect()
    assert [r["doc_id"] for r in top] == [0, 1, 2]  # ties -> doc_id order
    assert [r["rank"] for r in top] == [1, 2, 3]
    assert len({r["score"] for r in top}) == 1


def test_sample_hash_fraction_and_determinism(spark):
    df = spark.range(0, 20_000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("grp"),
    )
    s1 = textstats.sample_hash(df, ("event_id",), 0.1)
    n = s1.count()
    assert 0.08 * 20_000 < n < 0.12 * 20_000
    # identical membership on re-run and under different partitioning
    a = {r["event_id"] for r in s1.collect()}
    b = {r["event_id"] for r in
         textstats.sample_hash(df.repartition(13), ("event_id",), 0.1).collect()}
    assert a == b
    # per-stratum rate stays near the global fraction (stratified for free)
    per = (
        textstats.sample_hash(df, ("event_id",), 0.1)
        .groupBy("grp").count().collect()
    )
    for r in per:
        assert 0.05 < r["count"] / (20_000 / 7) < 0.16
    # different salt -> different (but still deterministic) membership
    c = {r["event_id"] for r in
         textstats.sample_hash(df, ("event_id",), 0.1, salt="s1").collect()}
    assert c != a and 0.08 * 20_000 < len(c) < 0.12 * 20_000


def test_index_path_equals_scan_path(spark, tmp_path):
    """The materialized inverted index reproduces search_topk exactly, and
    the postings read carries a partition filter on the term-hash bucket
    (pruning at file-listing time — per-query I/O independent of the number
    of index buckets actually on disk)."""
    import random

    rng = random.Random(2)
    vocab = [f"w{i}" for i in range(50)] + ["spark", "stream"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(30)) for _ in range(300)
    ]
    docs = _docs(spark, texts)
    idx = str(tmp_path / "idx")
    search.build_index(docs, idx)

    direct = search.search_topk(docs, ("spark", "stream"), k=20)
    via_index = search.search_index(spark, idx, ("spark", "stream"), k=20)
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, via_index.collect())
    )

    plan = via_index._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the bucket IN-filter must reach the partition level, not the row level
    import re
    pf = re.search(r"PartitionFilters: \[[^\]]*bucket[^\]]*\]", plan)
    assert pf, plan[:2000]


def test_index_layout_is_bucket_partitioned(spark, tmp_path):
    """The on-disk layout is bucket=N subdirectories (hive partitioning), so
    the PartitionFilters asserted in the previous test translate to whole
    directories skipped at file-listing time; a single term's postings live
    in exactly one bucket directory."""
    import os

    from pyspark.sql import functions as F

    docs = _docs(spark, ["spark alpha beta", "gamma delta spark"] * 20)
    idx = str(tmp_path / "idx2")
    search.build_index(docs, idx)
    bucket_dirs = sorted(
        d for d in os.listdir(f"{idx}/postings") if d.startswith("bucket=")
    )
    assert len(bucket_dirs) > 2  # enough distinct terms to make pruning real
    spark_bucket = (
        spark.createDataFrame([("spark",)], "term string")
        .select(
            F.pmod(F.xxhash64("term"), F.lit(search.INDEX_BUCKETS)).alias("b")
        )
        .first()["b"]
    )
    one_bucket = spark.read.parquet(f"{idx}/postings/bucket={spark_bucket}")
    terms_there = {r["term"] for r in one_bucket.select("term").distinct().collect()}
    assert "spark" in terms_there
    # and the term appears in NO other bucket directory
    for d in bucket_dirs:
        if d != f"bucket={spark_bucket}":
            others = spark.read.parquet(f"{idx}/postings/{d}")
            assert others.where(F.col("term") == "spark").count() == 0


def test_index_bucket_mismatch_raises(spark, tmp_path):
    """A modulus mismatch between writer and reader must fail loudly (it
    would otherwise silently prune matching postings away)."""
    import pytest

    docs = _docs(spark, ["spark stream sort"])
    idx = str(tmp_path / "idx3")
    search.build_index(docs, idx, n_buckets=32)
    # default reader picks up the stored modulus
    assert search.search_index(spark, idx, ("spark",), k=5).count() == 1
    with pytest.raises(ValueError, match="n_buckets=32"):
        search.search_index(spark, idx, ("spark",), k=5, n_buckets=64)
