"""Error-isolation contracts of the inference unit iterator (pure, no
Spark): failing units become all-O (logged), miscounting batch providers
fail loudly, bad pages drop atomically."""

import pytest

from jamie_spark import infer
from jamie_spark.standin import StandInJointExtractor


def _rows(texts):
    return [(f"u{i}", None, t) for i, t in enumerate(texts)]


class FlakyTagger:
    """Raises on any sentence containing the marker token."""

    subword_vocab = None

    def __init__(self):
        self._inner = StandInJointExtractor()

    def annotate_sentence(self, tokens):
        if "破" in tokens:
            raise RuntimeError("boom")
        return self._inner.annotate_sentence(tokens)


def test_streaming_shape_isolates_failing_units():
    rows = _rows(["肺癌を認める。破あり。胃癌を認める。"])
    out = list(infer._iter_annotated(FlakyTagger(), rows, "sentence", None))
    assert len(out) == 3  # NO unit lost
    by_sid = {o[1]: o for o in out}
    assert "B-d" in by_sid[0][4]          # sentence 0 tagged normally
    assert set(by_sid[1][4]) == {"O"}     # failing unit -> all-O
    assert "B-d" in by_sid[2][4]          # rest of the page intact


class MiscountingBatchTagger:
    subword_vocab = None

    def annotate_batch(self, batch):
        # drops one unit per batch — a contract violation
        n = len(batch[0])
        return [
            (["O"] * len(t), ["_"] * len(t), [[] for _ in t], [[] for _ in t])
            for t in batch[:-1]
        ]

    def annotate_sentence(self, tokens):
        raise AssertionError("batch path expected")


def test_miscounting_batch_provider_fails_loudly():
    rows = _rows(["肺癌を認める。胃癌を認める。"])
    with pytest.raises(ValueError):
        list(
            infer._iter_annotated(
                MiscountingBatchTagger(), rows, "sentence", None
            )
        )


class RaisingBatchTagger:
    """annotate_batch always raises; per-unit fallback must take over."""

    subword_vocab = None

    def __init__(self):
        self._inner = StandInJointExtractor()
        self.fallback_calls = 0

    def annotate_batch(self, batch):
        raise RuntimeError("batched path broken")

    def annotate_sentence(self, tokens):
        self.fallback_calls += 1
        return self._inner.annotate_sentence(tokens)


def test_raising_batch_provider_degrades_to_per_unit():
    t = RaisingBatchTagger()
    rows = _rows(["肺癌を認める。", "胃癌を認める。"])
    out = list(infer._iter_annotated(t, rows, "sentence", None))
    assert len(out) == 2 and t.fallback_calls == 2
    assert all("B-d" in o[4] for o in out)


def test_bad_page_drops_atomically():
    # html of a non-string/bytes type makes extract_text's regex search
    # raise — the page must vanish without touching its neighbors
    rows = [("good", None, "肺癌を認める。"),
            ("bad", 42, None),
            ("good2", None, "胃癌を認める。")]
    out = list(
        infer._iter_annotated(StandInJointExtractor(), rows, "sentence", None)
    )
    assert [o[0] for o in out] == ["good", "good2"]
