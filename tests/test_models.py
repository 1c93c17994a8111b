import pytest
from jamie_spark import models

def test_registry_standin_memoized():
    a = models.get_extractor("standin")
    b = models.get_extractor("standin")
    assert a is b
    ner, mod, rels, heads = a.annotate_sentence(["肺", "に", "肺癌", "を", "認", "める", "。"])
    assert "B-d" in ner and "B-a" in ner

def test_registry_torch_gated():
    with pytest.raises(NotImplementedError):
        models.get_extractor("torch:/nonexistent")

def test_registry_unknown():
    with pytest.raises(ValueError):
        models.get_extractor("bogus")


def test_torch_spec_without_torch_fails_fast_in_executors(spark, monkeypatch):
    """JAMIE_MODEL=torch:<dir> in an environment without torch must fail the
    job LOUDLY with the actionable message (never silently emit zero rows —
    a user pointing at a real model should not get an empty KG)."""
    import pytest

    from jamie_spark import fixtures, infer

    monkeypatch.setenv("JAMIE_MODEL", "torch:/nonexistent-model-dir")
    pages = fixtures.pages_df(spark, 4, seed=3)
    # the spec resolves DRIVER-side at plan time and ships by closure —
    # reading the env inside reused workers would silently run the stand-in
    with pytest.raises(Exception) as exc:
        infer.annotate_pages_flat(pages).count()
    assert "torch" in str(exc.value)
