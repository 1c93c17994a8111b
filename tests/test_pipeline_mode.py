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
