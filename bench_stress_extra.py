#!/usr/bin/env python
"""Stress-stage isolation harness (guide §1): replicates bench.py's stress
stages (same fixtures, same ops, same sizes) with per-stage timings so the
optimization work can measure them without running the full frozen bench.

Usage: python bench_stress_extra.py [dedup|pack|graph|link|stream|all]
Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_STRESS_DOCS / SPARK_GRAFT_STREAM_DOCS
as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    stress_docs = int(os.environ.get("SPARK_GRAFT_STRESS_DOCS", "500000"))
    stream_docs = int(os.environ.get("SPARK_GRAFT_STREAM_DOCS", "20000"))

    from bench import build_spark

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as PF

    from jamie_spark import canon, fixtures, kgstats, linkgraph, textstats

    timings: dict[str, float] = {}

    def clock(name, fn):
        spark.sparkContext.setJobDescription(name)
        t = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t, 3)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: timings[name], "out": out}), flush=True)
        return out

    if which in ("dedup", "all"):
        spark.catalog.clearCache()
        sdocs = fixtures.boilerplate_docs_df(spark, stress_docs).cache()
        sdocs.count()
        clock("stress_candidate_sec",
              lambda: textstats.minhash_pairs(sdocs).count())
        clock("dedup_stress_pairs",
              lambda: textstats.near_dup_pairs(sdocs).count())
        clock("dedup_stress_clusters",
              lambda: textstats.dedup_clusters(sdocs).count())
        sdocs.unpersist()

    if which in ("pack", "all"):
        pdocs = (
            fixtures.boilerplate_docs_df(spark, stress_docs)
            .withColumn(
                "source",
                PF.when(
                    PF.pmod(PF.xxhash64("doc_id", PF.lit(5)), PF.lit(10)) < 9,
                    PF.lit("cc"),
                ).otherwise(
                    PF.concat(
                        PF.lit("s"),
                        PF.pmod(PF.xxhash64("doc_id", PF.lit(7)), PF.lit(5)),
                    )
                ),
            )
            .cache()
        )
        pdocs.count()
        clock("pack_stress_budget", lambda: textstats.token_budget_sample(
            pdocs, budget=200_000, group_col="source").count())
        clock("pack_stress_sequence", lambda: textstats.sequence_pack(
            pdocs, 2048, group_col="source").count())
        ldocs = pdocs.select(
            "doc_id",
            PF.concat(
                PF.col("text"), PF.lit(" u"), PF.col("doc_id"),
                PF.lit(" v"), PF.col("doc_id"),
            ).alias("text"),
        )
        clock("lm_stress_surprisal",
              lambda: textstats.lm_surprisal(ldocs).count())
        pdocs.unpersist()

    if which in ("graph", "all"):
        from pyspark.sql import functions as SF

        n_edges = stress_docs
        gedges = fixtures.zipf_edges_df(
            spark, n_edges, max(n_edges // 10, 100), num_partitions=cpus
        ).persist()
        gedges.count()
        clock("graph_stress_triangles",
              lambda: kgstats.triangles(gedges).count())
        clock("graph_stress_pagerank",
              lambda: kgstats.pagerank_fixed(gedges, iters=3).count())
        clock("graph_stress_lpa",
              lambda: kgstats.label_propagation(gedges, iters=3).count())
        clock("graph_stress_kcore",
              lambda: kgstats.kcore(gedges, k=3, iters=3).count())
        hub = (
            gedges.groupBy("src")
            .agg(SF.count(SF.lit(1)).alias("fan"))
            .orderBy(SF.desc("fan"), "src")
            .first()["src"]
        )
        clock("graph_stress_bfs", lambda: kgstats.bfs_distances(
            gedges, hub, max_hops=4).count())
        tagged = gedges.withColumn(
            "tag", SF.pmod(SF.xxhash64("src", "dst", SF.lit(11)), SF.lit(10))
        ).persist()
        tagged.count()
        base_lab = canon.connected_components(
            tagged.where(SF.col("tag") != 0).select("src", "dst"),
            small_graph_edges=0,
        ).persist()
        base_lab.count()
        clock("graph_stress_inc_cc", lambda: canon.incremental_components(
            base_lab,
            tagged.where(SF.col("tag") == 0).select("src", "dst"),
            small_graph_edges=0,
        ).count())
        base_lab.unpersist()
        tagged.unpersist()
        gedges.unpersist()

    if which in ("link", "all"):
        from pyspark.sql import functions as SF

        spark.catalog.clearCache()
        lpages = fixtures.pages_df_distributed(
            spark, stress_docs, seed=77, n_partitions=cpus
        ).persist()
        lpages.count()
        links = linkgraph.extract_links(lpages).persist()
        clock("link_stress_extract", lambda: links.count())
        hg = linkgraph.host_graph(links).persist()
        clock("link_stress_hostgraph", lambda: hg.count())
        clock("link_stress_pagerank", lambda: kgstats.pagerank_weighted(
            hg.select(
                SF.col("src_host").alias("src"),
                SF.col("dst_host").alias("dst"),
                SF.col("n_links").alias("w"),
            ),
            iters=3,
        ).count())
        clock("link_stress_frontier", lambda: linkgraph.crawl_frontier(
            lpages, top_hosts=10, per_host_quota=1000, iters=3, links=links
        ).count())
        hg.unpersist()
        links.unpersist()
        lpages.unpersist()

    if which in ("stream", "all"):
        import shutil

        from pyspark.sql import functions as SF

        from jamie_spark import streaming

        base = f"/tmp/jamie_bstress_stream_{os.getpid()}"
        shutil.rmtree(base, ignore_errors=True)
        in_dir, s_out, s_ck, s_store = (
            f"{base}/in", f"{base}/out", f"{base}/ckpt", f"{base}/store"
        )
        concepts = fixtures.concept_df(spark)
        quarter = stream_docs // 4
        batch_secs = []
        for b in range(4):
            if b == 0:
                pages = fixtures.pages_df_distributed(spark, quarter, seed=100)
            else:
                fresh = fixtures.pages_df_distributed(
                    spark, quarter // 2, seed=200 + b
                ).withColumn(
                    "url", SF.concat(SF.lit(f"https://f{b}.test/"), SF.col("url"))
                )
                mirrors = fixtures.pages_df_distributed(
                    spark, quarter // 2, seed=100
                ).withColumn(
                    "url", SF.concat(SF.lit(f"https://m{b}.test/"), SF.col("url"))
                )
                pages = fresh.unionByName(mirrors)
            pages.coalesce(4).write.mode("append").parquet(in_dir)
            t = time.perf_counter()
            q = streaming.stream_kg_dedup(
                streaming.read_page_stream(
                    spark, in_dir, max_files_per_trigger=9999
                ),
                concepts, s_out, s_ck, s_store,
            )
            q.awaitTermination(600)
            batch_secs.append(round(time.perf_counter() - t, 3))
        timings["stream_stress_total"] = round(sum(batch_secs), 3)
        print(json.dumps({"stream_stress_total": timings["stream_stress_total"],
                          "stream_batch_secs": batch_secs}), flush=True)
        shutil.rmtree(base, ignore_errors=True)

    print(json.dumps({"stress_timings": timings}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
