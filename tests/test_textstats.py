"""Training-data op guards: the document-frequency cap on n-gram Jaccard
(the quadratic-blowup guard for boilerplate shingles)."""

from jamie_spark import textstats


def _docs(spark, n=20):
    # every doc shares the boilerplate shingle "x y z"; the tail shingle
    # "y z u{i}" is unique per doc
    return spark.createDataFrame(
        [(i, f"x y z u{i}") for i in range(n)], "doc_id long, text string"
    )


def test_hot_shingle_capped_out(spark):
    """A shingle shared by every document must be dropped by the DF cap —
    without it, k docs sharing one boilerplate shingle produce k^2/2 join
    rows at the self-join (the 100 TB failure mode)."""
    docs = _docs(spark)
    capped = textstats.ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=5)
    assert capped.count() == 0  # only the unique tail shingles survive

    uncapped = textstats.ngram_jaccard_pairs(
        docs, n=3, threshold=0.2, max_df=1000
    )
    assert uncapped.count() == 20 * 19 // 2  # all pairs at jaccard 1/3


def test_cap_keeps_low_df_pairs(spark):
    """Docs that are near-dups through low-DF shingles still pair up."""
    rows = [(i, f"x y z u{i}") for i in range(10)]
    rows += [(100, "p q r s t"), (101, "p q r s t")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = textstats.ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_df=5)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert got == {(100, 101): 1.0}
