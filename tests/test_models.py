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
