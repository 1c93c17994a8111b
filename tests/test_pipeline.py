"""End-to-end Spark pipeline tests: extraction, eval gate, linking,
canonicalization, materialization, lineage/resume."""

import os

import pytest
from pyspark.sql import functions as F

from jamie_spark import canon, eval as ev, fixtures, graph, infer, link, pipeline

N_DOCS = 120
SEED = 42


@pytest.fixture(scope="module")
def corpus(spark):
    pages = fixtures.pages_df(spark, N_DOCS, SEED).cache()
    gold_m, gold_r, gold_t = fixtures.gold_dfs(spark, N_DOCS, SEED)
    return {
        "pages": pages,
        "gold_mentions": gold_m.cache(),
        "gold_relations": gold_r,
        "gold_triples": gold_t.cache(),
        "concepts": fixtures.concept_df(spark).cache(),
    }


@pytest.fixture(scope="module")
def extracted(corpus):
    out = pipeline.run_extraction(corpus["pages"])
    out["annotations"] = out["annotations"].cache()
    return out


def test_extraction_byte_identity_distributed(spark, corpus):
    """N1 invariant through the Arrow UDF path: extracted == reference text."""
    ext = infer.extraction_only(corpus["pages"])
    joined = ext.join(corpus["pages"], "url")
    n_bad = joined.where(F.col("extracted_text") != F.col("text")).count()
    assert n_bad == 0


def test_lang_filter_pushdown(corpus):
    """The lang filter must reach the scan, not hide behind the UDF."""
    plan = infer.annotate_pages(corpus["pages"])._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan
    # filter appears below the python stage (it was applied pre-UDF)
    assert "lang" in plan


def test_flat_path_equals_nested_path(spark, corpus, extracted):
    """The Arrow-native hot path must emit exactly the nested path's
    mentions and triples (same decode semantics, different physical plan)."""
    from jamie_spark import mentions as mm

    flat = infer.annotate_pages_flat(corpus["pages"])
    key_m = ["url", "sent_id", "begin_tok", "end_tok", "ner_tag", "mod_tag", "surface"]
    nm = mm.mentions_from_annotations(extracted["annotations"]).select(*key_m)
    fm = mm.mentions_from_flat(flat).select(*key_m)
    assert nm.exceptAll(fm).count() == 0 and fm.exceptAll(nm).count() == 0
    key_t = ["url", "sent_id", "subj_surface", "pred", "obj_surface",
             "subj_tag", "obj_tag", "subj_mod"]
    nt = extracted["triples"].select(*key_t)
    ft = mm.triples_from_flat(flat).select(*key_t)
    assert nt.exceptAll(ft).count() == 0 and ft.exceptAll(nt).count() == 0


def test_mentions_match_gold(spark, corpus, extracted):
    """NER + modality P/R == 1.0 on the fixture corpus (E2/E3 gate)."""
    scores = ev.eval_mentions(corpus["gold_mentions"], extracted["mentions"])
    assert scores["ner"]["f1"] == pytest.approx(1.0)
    assert scores["mod"]["f1"] == pytest.approx(1.0)


def test_triples_match_gold(spark, corpus, extracted):
    """Mention-string triple P/R >= 0.95 gate (BASELINE.md) — exact here."""
    scores = ev.eval_triples(corpus["gold_triples"], extracted["triples"])
    assert scores["precision"] == pytest.approx(1.0)
    assert scores["recall"] == pytest.approx(1.0)


def test_tid_assignment_matches_gold(corpus, extracted):
    """Document-order T{n} numbering (reference data_objects.py:272-277)."""
    pred = extracted["mentions"].select("url", "sent_id", "begin_tok", "tid")
    gold = corpus["gold_mentions"].select(
        "url", "sent_id", "begin_tok", F.col("tid").alias("gold_tid")
    )
    n_bad = (
        pred.join(gold, ["url", "sent_id", "begin_tok"])
        .where(F.col("tid") != F.col("gold_tid"))
        .count()
    )
    assert n_bad == 0


def test_evaluator_detects_errors(spark, corpus, extracted):
    """The evaluator is a real gate: a perturbed prediction scores < 1.0
    with exactly the multiset tps/fps/fns bookkeeping of the reference."""
    pred = extracted["triples"].withColumn(
        "pred",
        F.when(F.col("pred") == "region", F.lit("timeOnset")).otherwise(F.col("pred")),
    )
    scores = ev.eval_triples(corpus["gold_triples"], pred)
    assert scores["f1"] < 1.0
    region = scores["per_label"]["region"]
    assert region["recall"] == 0.0


def test_modality_family_scores_and_downsampling(spark, corpus, extracted):
    """E4 family roll-up is perfect on the fixture corpus; R3 keeps all
    positives and a seeded fraction of negatives."""
    fams = ev.modality_family_scores(corpus["gold_mentions"], extracted["mentions"])
    assert set(fams) <= {"certainty", "state", "type"}
    assert all(v["f1"] == pytest.approx(1.0) for v in fams.values())

    pairs = spark.createDataFrame(
        [(i, "N" if i % 2 else "region") for i in range(1000)],
        "pair_id long, rel string",
    )
    kept = ev.downsample_negatives(pairs, "rel", keep_prob=0.1, seed=1)
    assert kept.where("rel != 'N'").count() == 500  # all positives kept
    n_neg = kept.where("rel = 'N'").count()
    assert 10 <= n_neg <= 120  # ~10% of 500 negatives
    # partitioning-invariant (the no-rand rule): the SAME rows survive
    # under any repartitioning, and re-evaluation cannot change the set
    ids = sorted(r["pair_id"] for r in kept.select("pair_id").collect())
    re_kept = ev.downsample_negatives(
        pairs.repartition(7), "rel", keep_prob=0.1, seed=1
    )
    assert sorted(r["pair_id"] for r in re_kept.select("pair_id").collect()) == ids


def test_per_label_counts_null_safe(spark):
    """Reference multiset semantics: None == None. A NULL label is a real
    label (not silently dropped by the isin filter), and tuples agreeing
    on a NULL key field still pair up."""
    gold = spark.createDataFrame(
        [(1, "d", None), (2, None, "x")],
        "tid long, label string, extra string",
    )
    pred = spark.createDataFrame(
        [(1, "d", None), (2, None, "x"), (3, None, "y")],
        "tid long, label string, extra string",
    )
    got = {
        r["label"]: (r["tps"], r["fps"], r["fns"])
        for r in ev.per_label_counts(
            gold, pred, ["tid", "extra"], "label"
        ).collect()
    }
    assert got["d"] == (1, 0, 0)       # NULL extra matched null-safely
    assert got[None] == (1, 1, 0)      # NULL label: one TP, one FP


def test_linking_exact_and_fuzzy(spark, corpus):
    surfaces = spark.createDataFrame(
        [("肺癌",), ("アスピリン",), ("肺がん",), ("はいえん",), ("ワーファリン",)],
        "surface string",
    )
    links = link.link_surfaces(surfaces, corpus["concepts"]).collect()
    by_surface = {r["surface"]: r for r in links}
    # exact hits
    assert by_surface["肺癌"]["method"] == "exact"
    assert by_surface["肺がん"]["method"] == "exact"  # alias row exists
    # every dictionary alias surface resolves to its own concept
    lung = by_surface["肺癌"]["concept_id"]
    assert by_surface["肺がん"]["concept_id"] == lung


def test_linking_fuzzy_minhash(spark, corpus):
    """A surface absent from the alias table links via MinHash candidates
    (fuzzy='minhash' requested explicitly — the method column reports the
    strategy that actually ran; it used to say 'minhash' even on the
    default broadcast path)."""
    surfaces = spark.createDataFrame([("アスピリン錠剤",)], "surface string")
    links = link.link_surfaces(
        surfaces, corpus["concepts"], fuzzy="minhash"
    ).collect()
    assert len(links) == 1
    assert links[0]["method"] == "minhash"
    # the default path labels its own strategy
    bl = link.link_surfaces(surfaces, corpus["concepts"]).collect()
    assert len(bl) == 1 and bl[0]["method"] == "broadcast"
    assert bl[0]["concept_id"] == links[0]["concept_id"]
    aspirin = (
        corpus["concepts"].where(F.col("canonical") == "アスピリン").first()["concept_id"]
    )
    assert links[0]["concept_id"] == aspirin


def test_canonicalization_distributed_equals_unionfind(spark, corpus):
    """All physical strategies (driver union-find / large-small star /
    min-label propagation) produce identical components."""
    edges = corpus["concepts"].select(
        F.col("alias").alias("src"), F.col("concept_id").alias("dst")
    ).distinct()
    key = lambda r: (r["vertex"], r["component"])  # noqa: E731
    fast = sorted(map(key, canon.connected_components(edges).collect()))
    star = sorted(map(key, canon.connected_components(
        edges, small_graph_edges=0, algorithm="star").collect()))
    minl = sorted(map(key, canon.connected_components(
        edges, small_graph_edges=0, algorithm="minlabel").collect()))
    assert fast == star == minl


def test_star_components_solve_deep_graphs(spark):
    """A 120-vertex path (diameter 119): min-label propagation exhausts
    max_iter=25 and raises; the star algorithm converges in O(log n) rounds
    — the diameter failure mode is gone at any scale."""
    n = 120
    edges = spark.createDataFrame(
        [(f"v{i:03d}", f"v{i + 1:03d}") for i in range(n - 1)],
        "src string, dst string",
    )
    with pytest.raises(RuntimeError):
        canon.connected_components(
            edges, small_graph_edges=0, algorithm="minlabel", max_iter=25
        ).collect()
    got = {
        r["vertex"]: r["component"]
        for r in canon.connected_components(
            edges, small_graph_edges=0, algorithm="star"
        ).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {"v000"}


def test_star_components_random_graph_vs_unionfind(spark):
    """Star components == union-find ground truth on a seeded random graph
    with several components and cycles."""
    import random

    rng = random.Random(13)
    edges = []
    for comp in range(6):
        members = [f"c{comp}_{i:02d}" for i in range(rng.randint(2, 25))]
        for i in range(1, len(members)):
            edges.append((members[i], members[rng.randrange(i)]))
        for _ in range(len(members) // 3):  # extra cycle edges
            edges.append((rng.choice(members), rng.choice(members)))
    df = spark.createDataFrame(edges, "src string, dst string")
    truth = canon._union_find([{"src": a, "dst": b} for a, b in edges])
    got = {
        r["vertex"]: r["component"]
        for r in canon.connected_components(
            df, small_graph_edges=0, algorithm="star"
        ).collect()
    }
    # union-find may include self-loop-only vertices identically
    assert got == {v: c for v, c in truth.items()}


def test_canonicalization_components(spark, corpus):
    """Cross-linked alias groups merge; independent concepts stay apart."""
    canon_map = canon.canonicalize_concepts(corpus["concepts"])
    rows = {r["concept_id"]: r["canonical_id"] for r in canon_map.collect()}
    cdf = corpus["concepts"]
    cid = {
        r["canonical"]: r["concept_id"]
        for r in cdf.select("canonical", "concept_id").distinct().collect()
    }
    # every concept got a canonical id; representative is min concept_id
    assert set(rows) == set(cid.values())
    assert all(rows[c] <= c for c in rows)
    # 肺癌 and 胃癌 are distinct components
    assert rows[cid["肺癌"]] != rows[cid["胃癌"]]


def test_full_kg_and_materialization(spark, corpus, tmp_path):
    result = pipeline.run_kg(corpus["pages"], corpus["concepts"])
    canonical = result["canonical_triples"].cache()
    n = canonical.count()
    assert n > 0
    # every subj/obj resolved to a concept id or kept as surface fallback
    assert canonical.where(F.col("subj_id").isNull()).count() == 0

    out = str(tmp_path / "graph")
    graph.materialize(canonical, out, n_buckets=8, n_salts=4)
    back = spark.read.parquet(out)
    assert back.count() == n
    # bucket pruning column exists and is within range
    assert back.select(F.max("bucket")).first()[0] < 8


def test_skew_salting_bounds_partition_sizes(spark):
    """FIXTURES.md §6: with a 肺癌-heavy corpus, salting keeps the max
    (bucket, salt) cell within a sane multiple of the median."""
    pages = fixtures.pages_df(spark, 300, seed=7, skew=True)
    concepts_df = fixtures.concept_df(spark)
    result = pipeline.run_kg(pages, concepts_df)
    canonical = result["canonical_triples"].cache()
    hist = graph.partition_histogram(canonical, n_buckets=8, n_salts=8).cache()
    salted_max = hist.agg(F.max("rows")).first()[0]
    unsalted_max = (
        hist.groupBy("bucket").agg(F.sum("rows").alias("rows"))
        .agg(F.max("rows")).first()[0]
    )
    # the hot subject's bucket must be spread over the salt dimension
    assert salted_max * 2 <= unsalted_max, (salted_max, unsalted_max)
    canonical.unpersist()


def test_skew_salting_zipf_1m_triples(spark):
    """N5 at scale shape: 1M triples with a Zipf(1) subject distribution
    (log-uniform rank draw over 1000 subjects -> the head subject owns ~13%
    of all rows, the canonical head-entity skew at 10^12 docs). With salting
    ON, (a) max cell / median cell stays under 10 — the floor for this
    layout is hot_share * n_buckets (~4.3 here, amplified ~2x because the
    Zipf tail drags the median below the mean): bucket stays a pure function
    of subj_id for read pruning, so a hot subject concentrates in ONE
    bucket and the salt dimension divides it by n_salts, which divides max
    and median alike — and (b) the max cell is at least 4x smaller than the
    unsalted max bucket, the ABSOLUTE task-size reduction that kills the
    straggler (the metric that matters for wall-clock)."""
    n = 1_000_000
    u = F.pmod(F.xxhash64("id", F.lit(13)), F.lit(1_000_000)) / 1_000_000.0
    triples = spark.range(0, n, numPartitions=32).select(
        F.concat(F.lit("S"), F.floor(F.pow(F.lit(1000.0), u)).cast("string"))
        .alias("subj_id"),
        F.concat(F.lit("P"), (F.col("id") % 7).cast("string")).alias("pred"),
        F.concat(F.lit("O"), (F.col("id") % 50_000).cast("string"))
        .alias("obj_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 13).cast("int").alias("sent_id"),
    )
    hist = graph.partition_histogram(triples, n_buckets=32, n_salts=8).cache()
    try:
        row = hist.agg(
            F.max("rows").alias("mx"),
            F.expr("percentile(rows, 0.5)").alias("med"),
        ).first()
        salted_max, median = row["mx"], row["med"]
        unsalted_max = (
            hist.groupBy("bucket").agg(F.sum("rows").alias("rows"))
            .agg(F.max("rows")).first()[0]
        )
        assert salted_max <= 10 * median, (salted_max, median)
        assert salted_max * 4 <= unsalted_max, (salted_max, unsalted_max)
    finally:
        hist.unpersist()


def test_run_kg_empty_corpus(spark, corpus):
    """Zero input pages -> zero triples, no crash anywhere in the chain."""
    empty = corpus["pages"].where(F.lit(False))
    result = pipeline.run_kg(empty, corpus["concepts"])
    assert result["canonical_triples"].count() == 0


def test_run_kg_html_only_pages(spark, corpus):
    """Pages with text=NULL exercise the html extraction path end-to-end and
    produce the same triples as the text-bearing corpus."""
    html_only = corpus["pages"].withColumn("text", F.lit(None).cast("string"))
    a = pipeline.run_kg(html_only, corpus["concepts"])["canonical_triples"]
    b = pipeline.run_kg(corpus["pages"], corpus["concepts"])["canonical_triples"]
    key = ["url", "sent_id", "subj_surface", "pred", "obj_surface"]
    assert a.select(*key).exceptAll(b.select(*key)).count() == 0
    assert a.count() == b.count() > 0


def test_annotate_ships_html_only_without_text(spark, corpus):
    """The annotate input projection nulls html JVM-side whenever text is
    populated (html is read ONLY by the extract_text fallback), so the
    widest crawl column never crosses the Arrow boundary for pages whose
    text is already extracted — and a MIXED corpus (half the pages
    text-less) still produces exactly the full-text corpus's triples."""
    mixed = corpus["pages"].withColumn(
        "text",
        F.when(F.crc32(F.col("url")) % 2 == 0, F.col("text")),
    )
    shipped = mixed.select(*infer._page_cols())
    kept = shipped.where(F.col("html").isNotNull()).count()
    textless = mixed.where(
        F.col("text").isNull() | (F.col("text") == "")
    ).count()
    assert 0 < kept < mixed.count()   # the split actually exercises both arms
    assert kept == textless           # html survives ONLY for the fallback rows
    a = pipeline.run_kg(mixed, corpus["concepts"])["canonical_triples"]
    b = pipeline.run_kg(corpus["pages"], corpus["concepts"])["canonical_triples"]
    key = ["url", "sent_id", "subj_surface", "pred", "obj_surface"]
    assert a.select(*key).exceptAll(b.select(*key)).count() == 0
    assert a.count() == b.count() > 0


def test_lineage_model_swap_invalidates(spark, corpus, tmp_path):
    """A different model_version must rerun buckets, not skip them."""
    from jamie_spark import lineage as lin, models

    out = str(tmp_path / "kg_swap")
    pipeline.run_with_lineage(
        spark, corpus["pages"], corpus["concepts"], out, n_buckets=2
    )
    assert lin.pending_buckets(spark, out, "kg_triples", 2,
                               model_version=models.model_version()) == []
    assert lin.pending_buckets(spark, out, "kg_triples", 2,
                               model_version="torch:other-model") == [0, 1]


def test_lineage_resume_idempotent(spark, corpus, tmp_path):
    """Kill-after-k-buckets then rerun == one-shot run; no duplicate lineage."""
    out = str(tmp_path / "kg")
    # simulated crash: only 2 buckets complete
    first = pipeline.run_with_lineage(
        spark, corpus["pages"], corpus["concepts"], out, n_buckets=4, max_buckets=2
    )
    assert len(first) == 2
    # resume: remaining buckets only
    second = pipeline.run_with_lineage(
        spark, corpus["pages"], corpus["concepts"], out, n_buckets=4
    )
    assert sorted(first + second) == [0, 1, 2, 3]
    # third run: nothing pending
    third = pipeline.run_with_lineage(
        spark, corpus["pages"], corpus["concepts"], out, n_buckets=4
    )
    assert third == []

    resumed = pipeline.read_materialized(spark, out)
    oneshot = pipeline.run_kg(corpus["pages"], corpus["concepts"])["canonical_triples"]
    key = ["url", "sent_id", "subj_surface", "pred", "obj_surface", "subj_id", "obj_id"]
    a = resumed.groupBy(*key).count()
    b = oneshot.groupBy(*key).count()
    assert a.join(b, key + ["count"], "full_outer").where(
        F.col("count").isNull()
    ).count() == 0
    assert a.count() == b.count()

    lin = pipeline.lineage.read_lineage(spark, out)
    assert lin.groupBy("bucket").count().where(F.col("count") > 1).count() == 0
    assert lin.agg(F.sum("triple_count")).first()[0] == oneshot.count()
    # the ledger records the modulus on every row
    assert {r["n_buckets"] for r in lin.select("n_buckets").collect()} == {4}


def test_lineage_rejects_modulus_change(spark, corpus, tmp_path):
    """Resuming with a different --buckets value renumbers the url-hash
    partitions against the kept bucket=N data dirs (silent duplicate/drop)
    — pending_buckets must refuse, same contract as the search index's
    stats validation."""
    import pytest as _pytest

    out = str(tmp_path / "kg")
    pipeline.run_with_lineage(
        spark, corpus["pages"], corpus["concepts"], out,
        n_buckets=4, max_buckets=1,
    )
    with _pytest.raises(ValueError, match="n_buckets"):
        pipeline.run_with_lineage(
            spark, corpus["pages"], corpus["concepts"], out, n_buckets=8
        )


def test_parallel_buckets_resume_idempotent(spark, corpus, tmp_path):
    """--parallel-buckets: overlapped bucket runs keep per-bucket lineage
    atomicity — kill/resume and output parity as in the sequential case."""
    out = str(tmp_path / "kg_par")
    first = pipeline.run_with_lineage(
        spark, corpus["pages"], corpus["concepts"], out,
        n_buckets=4, max_buckets=2, parallel_buckets=2,
    )
    assert len(first) == 2
    second = pipeline.run_with_lineage(
        spark, corpus["pages"], corpus["concepts"], out,
        n_buckets=4, parallel_buckets=2,
    )
    assert sorted(first + second) == [0, 1, 2, 3]

    resumed = pipeline.read_materialized(spark, out)
    sequential = pipeline.run_kg(corpus["pages"], corpus["concepts"])[
        "canonical_triples"
    ]
    key = ["url", "sent_id", "subj_surface", "pred", "obj_surface",
           "subj_id", "obj_id"]
    a = resumed.groupBy(*key).count()
    b = sequential.groupBy(*key).count()
    assert a.join(b, key + ["count"], "full_outer").where(
        F.col("count").isNull()
    ).count() == 0

    lin = pipeline.lineage.read_lineage(spark, out)
    assert lin.groupBy("bucket").count().where(F.col("count") > 1).count() == 0


def test_cli_analytics_and_ntriples_export(spark, tmp_path):
    """--analytics and --export-nt publish the graph profile and the
    N-Triples view of the materialized KG from the same CLI invocation."""
    from jamie_spark import cli

    out = str(tmp_path / "kg_out")
    nt = str(tmp_path / "kg.nt")
    rc = cli.main([
        "--fixture", "40", "--out", out, "--buckets", "2",
        "--analytics", "--export-nt", nt,
    ])
    assert rc == 0
    triples = pipeline.read_materialized(spark, out)
    n = triples.count()
    assert n > 0
    deg = spark.read.parquet(f"{out}/analytics/degrees")
    pr = spark.read.parquet(f"{out}/analytics/pagerank")
    lp = spark.read.parquet(f"{out}/analytics/communities")
    n_nodes = (
        triples.select(F.col("subj_id").alias("n"))
        .unionByName(triples.select(F.col("obj_id").alias("n")))
        .distinct()
        .count()
    )
    assert deg.count() == n_nodes == pr.count()
    assert 0 < lp.count() <= n_nodes  # LPA drops self-loop-only vertices
    lines = spark.read.text(nt)
    assert lines.count() == n
    assert lines.where(~F.col("value").rlike("^<.+> <.+> .+ \\.$")).count() == 0


def test_incremental_components_equals_full_recompute(spark):
    """Folding an edge batch into existing labels == full CC over the union,
    on a seeded random graph where the batch merges components, extends
    them with new vertices, adds batch-only components, and lands edges
    INSIDE existing components (no-ops). Distributed star path forced."""
    import random

    rng = random.Random(4052)
    base, batch = [], []
    for comp in range(5):
        members = [f"g{comp}_{i:02d}" for i in range(rng.randint(3, 15))]
        for i in range(1, len(members)):
            base.append((members[i], members[rng.randrange(i)]))
        # batch edge inside the existing component (must be a no-op)
        batch.append((rng.choice(members), rng.choice(members)))
    # batch merges components 0+1 and 2+3, grows 4 with new vertices,
    # and adds a brand-new two-vertex component
    batch += [
        ("g0_00", "g1_00"), ("g2_01", "g3_02"),
        ("g4_00", "new_a"), ("new_a", "new_b"),
        ("island_x", "island_y"),
    ]
    base_df = spark.createDataFrame(base, "src string, dst string")
    batch_df = spark.createDataFrame(batch, "src string, dst string")
    labels = canon.connected_components(
        base_df, small_graph_edges=0, algorithm="star"
    )
    got = sorted(
        (r["vertex"], r["component"])
        for r in canon.incremental_components(
            labels, batch_df, small_graph_edges=0
        ).collect()
    )
    want = sorted(
        (r["vertex"], r["component"])
        for r in canon.connected_components(
            base_df.unionByName(batch_df), small_graph_edges=0,
            algorithm="star",
        ).collect()
    )
    assert got == want


def test_incremental_components_batch_only_touches_batch(spark):
    """A batch that never touches existing components leaves every old
    label untouched and appends only the batch's own component."""
    base_df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    labels = canon.connected_components(base_df)
    got = {
        r["vertex"]: r["component"]
        for r in canon.incremental_components(
            labels,
            spark.createDataFrame([("p", "q")], "src string, dst string"),
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "p": "p", "q": "p"}
