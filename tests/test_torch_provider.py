"""TorchJointExtractor mock tests: the full batched forward path — artifact
load sequence, per-batch padding, [CLS]/[SEP] framing, subword->word
realignment, relation anchor remapping — exercised against fake
torch/transformers modules, so swapping JAMIE_MODEL=torch:<dir> in a real
torch environment is a config change, not a build."""

import json
import pickle

import pytest

from jamie_spark import models

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "肺", "##癌", "に", "腫", "##瘍", "を", "認", "##める", "。",
]


class FakeTokenizer:
    def __init__(self, vocab):
        self._v = {t: i for i, t in enumerate(vocab)}
        self._rev = dict(enumerate(vocab))

    @classmethod
    def from_pretrained(cls, model_dir, **kw):
        assert kw == {
            "do_lower_case": False,
            "do_basic_tokenize": False,
            "tokenize_chinese_chars": False,
        }
        with open(f"{model_dir}/vocab.txt") as fi:
            return cls([line.rstrip("\n") for line in fi])

    def get_vocab(self):
        return dict(self._v)

    def tokenize(self, word):
        from jamie_spark.subword import wordpiece

        return wordpiece(word, set(self._v))

    def convert_tokens_to_ids(self, toks):
        if isinstance(toks, str):
            return self._v.get(toks, self._v["[UNK]"])
        return [self._v.get(t, self._v["[UNK]"]) for t in toks]


class FakeModel:
    """Deterministic stand-in for the torch checkpoint: tags 肺癌 as d and
    腫瘍 as a at the SUBWORD level and emits one rel dict per sentence
    containing both — the exact output contract of the reference eval
    forward (model.py:641-709 pred path)."""

    NER = {"肺": "B-d", "##癌": "I-d", "腫": "B-a", "##瘍": "I-a"}

    def __init__(self, vocab):
        self._rev = dict(enumerate(vocab))

    def eval(self):
        return self

    def __call__(self, tok_rows, attn_rows, sent_rows):
        width = {len(r) for r in tok_rows}
        assert len(width) == 1, "batch must be padded rectangular"
        assert {len(r) for r in attn_rows} == width
        assert {len(r) for r in sent_rows} == width
        ner_out, mod_out, rel_out = [], [], []
        for ids, attn in zip(tok_rows, attn_rows):
            toks = [self._rev[i] for i in ids]
            assert all(
                (t == "[PAD]") == (a == 0) for t, a in zip(toks, attn)
            ), "attention mask must cover exactly the non-pad positions"
            ner = [self.NER.get(t, "O") for t in toks]
            mod = ["positive" if t == "##癌" else "_" for t in toks]
            subj = [i for i, t in enumerate(toks) if t in ("肺", "##癌")]
            obj = [i for i, t in enumerate(toks) if t in ("腫", "##瘍")]
            rels = (
                [{"subject": subj, "predicate": "region", "object": obj}]
                if subj and obj
                else []
            )
            ner_out.append(ner)
            mod_out.append(mod)
            rel_out.append(rels)
        return ner_out, mod_out, rel_out


class FakeNoGrad:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


class FakeTorch:
    long = "long"
    bool = "bool"
    no_grad = FakeNoGrad

    @staticmethod
    def tensor(x, dtype=None):
        return x

    @staticmethod
    def load(path, map_location=None, weights_only=None):
        assert map_location == "cpu"
        # torch >= 2.6 defaults weights_only=True, which rejects the
        # reference's whole-module pickle — the provider must opt out
        assert weights_only is False
        with open(path, "rb") as fi:
            return pickle.load(fi)


class FakeTransformers:
    BertTokenizer = FakeTokenizer


@pytest.fixture()
def model_dir(tmp_path, monkeypatch):
    """The reference artifact layout (clinical_joint.py:443-453):
    model.pt + tokenizer vocab + {ner,mod,rel}2ix.json."""
    (tmp_path / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    with open(tmp_path / "model.pt", "wb") as fo:
        pickle.dump(FakeModel(VOCAB), fo)
    for name, labs in (
        ("ner2ix", ["O", "B-d", "I-d", "B-a", "I-a"]),
        ("mod2ix", ["_", "positive"]),
        ("rel2ix", ["N", "region"]),
    ):
        (tmp_path / f"{name}.json").write_text(
            json.dumps({lab: i for i, lab in enumerate(labs)})
        )
    monkeypatch.setattr(
        models, "_torch_deps", lambda: (FakeTorch, FakeTransformers)
    )
    return str(tmp_path)


def test_forward_and_realign(model_dir):
    ex = models.TorchJointExtractor(model_dir)
    assert "肺" in ex.subword_vocab  # T12 gate becomes subword-exact
    ner, mod, rels, heads = ex.annotate_sentence(
        ["肺癌", "に", "腫瘍", "を", "認める", "。"]
    )
    assert ner == ["B-d", "O", "B-a", "O", "O", "O"]
    assert mod == ["positive", "_", "_", "_", "_", "_"]
    assert rels == [["region"], [], [], [], [], []]
    assert heads == [[2], [], [], [], [], []]


def test_batch_padding_mixed_lengths(model_dir):
    """Sentences of different lengths in one Arrow batch: padded to the
    batch max (checked inside FakeModel), outputs per-sentence aligned."""
    ex = models.TorchJointExtractor(model_dir)
    out = ex.annotate_batch(
        [["肺癌", "に", "腫瘍", "を", "認める", "。"], ["肺癌", "。"]]
    )
    assert len(out) == 2
    ner2, mod2, rels2, heads2 = out[1]
    assert ner2 == ["B-d", "O"]
    assert mod2 == ["positive", "_"]
    assert rels2 == [[], []]  # no object entity in sentence 2


def test_over_length_sentence_backstop(model_dir):
    ex = models.TorchJointExtractor(model_dir)
    long_sent = ["肺癌"] * 600  # 2 subwords each -> over the encoder limit
    ner, mod, rels, heads = ex.annotate_sentence(long_sent)
    assert ner == ["O"] * 600 and mod == ["_"] * 600
    assert rels == [[] for _ in range(600)]


def test_registry_resolves_torch_spec(model_dir):
    ex = models.get_extractor(f"torch:{model_dir}")
    assert isinstance(ex, models.TorchJointExtractor)
    assert models.get_extractor(f"torch:{model_dir}") is ex  # memoized


def test_missing_torch_raises_not_implemented(tmp_path):
    with pytest.raises(NotImplementedError):
        models.TorchJointExtractor(str(tmp_path))
