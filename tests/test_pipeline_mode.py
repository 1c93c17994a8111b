"""M4-M6 staged pipeline == M1 joint path (contract equality)."""

import pytest
from pyspark.sql import functions as F

from jamie_spark import fixtures, infer, pipeline_mode


@pytest.fixture(scope="module")
def joint(spark):
    pages = fixtures.pages_df(spark, 50, seed=13)
    return infer.annotate_pages(pages).cache()


def test_staged_equals_joint(spark, joint):
    tokens_df = joint.select("url", "sent_id", "tokens")
    staged = pipeline_mode.run_pipeline_mode(tokens_df)

    cols = ["url", "sent_id", "tokens", "ner", "mod", "rels", "heads"]
    j = {(r["url"], r["sent_id"]): r for r in joint.select(*cols).collect()}
    s = {(r["url"], r["sent_id"]): r for r in staged.collect()}
    assert set(j) == set(s)
    for key in j:
        for c in cols[2:]:
            assert list(j[key][c]) == list(s[key][c]), (key, c)


def test_stages_are_individually_runnable(spark, joint):
    """Each stage is independently checkpointable (own schema, own pass)."""
    tokens_df = joint.select("url", "sent_id", "tokens")
    ner = pipeline_mode.ner_stage(tokens_df)
    assert ner.columns == ["url", "sent_id", "tokens", "ner"]
    mod = pipeline_mode.mod_stage(ner)
    assert mod.columns == ["url", "sent_id", "tokens", "ner", "mod"]
    assert mod.where(F.array_contains("mod", "positive")).count() > 0


def test_staged_pipeline_isolates_malformed_bio(spark):
    """The staged path's contract — 'any NER model's checkpointed output
    can feed it' — must hold for malformed tags too: a bad BIO tag
    degrades that sentence to no-spans instead of killing the task (the
    joint path's per-unit isolation, mirrored)."""
    bad = spark.createDataFrame(
        [
            ("u1", 0, ["肺癌", "あり"], ["B-d", "X-d"]),   # malformed
            ("u1", 1, ["骨折", "あり"], ["B-d", "O"]),     # fine
        ],
        "url string, sent_id int, tokens array<string>, ner array<string>",
    )
    mod = pipeline_mode.mod_stage(bad)
    rows = {r["sent_id"]: r for r in mod.collect()}
    assert rows[0]["mod"] == ["_", "_"]          # degraded, not crashed
    assert rows[1]["mod"][0] != "_"              # healthy row unaffected
    full = pipeline_mode.rel_stage(mod)
    assert full.count() == 2                     # rel stage survives too
