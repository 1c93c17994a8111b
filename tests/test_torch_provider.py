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

    def save_pretrained(self, out_dir):
        """Mirror transformers' vocab persistence (the part the provider's
        from_pretrained consumes)."""
        toks = [t for t, _ in sorted(self._v.items(), key=lambda kv: kv[1])]
        with open(f"{out_dir}/vocab.txt", "w") as fo:
            fo.write("\n".join(toks) + "\n")


class FakeTensor:
    """List-of-lists tensor twin that pins the EXACT contract the real
    torch.tensor call must produce: rectangular shape and the dtype the
    provider requested. The reference forward takes (token_ids long,
    attn_mask bool, sent_mask long) — model.py:641-709."""

    def __init__(self, rows, dtype):
        widths = {len(r) for r in rows}
        assert len(widths) == 1, "tensor rows must be rectangular"
        self.rows = rows
        self.dtype = dtype
        self.shape = (len(rows), widths.pop())

    def __iter__(self):
        return iter(self.rows)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        return self.rows[i]


class FakeModel:
    """Deterministic stand-in for the torch checkpoint: tags 肺癌 as d and
    腫瘍 as a at the SUBWORD level and emits one rel dict per sentence
    containing both — the exact output contract of the reference eval
    forward (model.py:641-709 pred path). Records its last call so tests
    can assert exactly what reached the encoder."""

    NER = {"肺": "B-d", "##癌": "I-d", "腫": "B-a", "##瘍": "I-a"}
    last_call = None

    def __init__(self, vocab):
        self._rev = dict(enumerate(vocab))

    def eval(self):
        return self

    def __call__(self, tok_rows, attn_rows, sent_rows):
        # exact tensor contract: dtypes and one shared (B, L) shape
        for t, want_dtype in (
            (tok_rows, "long"), (attn_rows, "bool"), (sent_rows, "long")
        ):
            assert isinstance(t, FakeTensor), "forward must receive tensors"
            assert t.dtype == want_dtype, (t.dtype, want_dtype)
        assert tok_rows.shape == attn_rows.shape == sent_rows.shape
        assert all(
            isinstance(v, int) and v >= 0 for r in tok_rows for v in r
        ), "token ids must be non-negative ints"
        assert all(v in (0, 1) for r in attn_rows for v in r)
        assert all(v in (0, 1) for r in sent_rows for v in r)
        FakeModel.last_call = (tok_rows, attn_rows, sent_rows)
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
        assert dtype is not None, "provider must pin every tensor dtype"
        return FakeTensor(x, dtype)

    @staticmethod
    def save(obj, path):
        with open(path, "wb") as fo:
            pickle.dump(obj, fo)

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


SENT = ["肺癌", "に", "腫瘍", "を", "認める", "。"]


def test_forward_tensor_shapes_exact(model_dir):
    """The encoder receives exactly (B_live, max_subwords + 2) in all three
    tensors, with the documented dtypes (long, bool, long) — the contract a
    real torch checkpoint would see."""
    ex = models.TorchJointExtractor(model_dir)
    ex.annotate_batch([SENT, ["肺癌", "。"]])
    toks, attn, sent = FakeModel.last_call
    # 肺癌/腫瘍/認める -> 2 subwords each, に/を/。 -> 1 each: 9 subwords,
    # + [CLS]/[SEP] frame = 11
    assert toks.shape == attn.shape == sent.shape == (2, 11)
    assert (toks.dtype, attn.dtype, sent.dtype) == ("long", "bool", "long")
    # row 2 (3 subwords + frame = 5) is padded with exactly 6 zeros
    assert attn[1] == [1] * 5 + [0] * 6
    assert toks[1][5:] == [0] * 6  # [PAD] id is 0 in VOCAB


def test_doc_mode_sent_mask_reaches_encoder(model_dir):
    """B6 through the provider: a doc-level trunk with an in-band [SEP]
    must reach the encoder with token_type_ids flipping AFTER that [SEP]
    (reference utils.py:2081-2089; the [SEP] itself keeps the pre-flip
    value)."""
    ex = models.TorchJointExtractor(model_dir)
    ex.annotate_batch([["肺癌", "[SEP]", "腫瘍"]])
    _, _, sent = FakeModel.last_call
    # [CLS] 肺 ##癌 [SEP](in-band) | 腫 ##瘍 [SEP](frame)
    assert sent[0] == [0, 0, 0, 0, 1, 1, 1]


def test_save_artifacts_round_trip(model_dir, tmp_path):
    """S12 SAVE side: load -> save_artifacts -> load from the new dir gives
    an extractor with identical behavior, and the new dir carries the exact
    reference layout (model.pt + vocab.txt + {ner,mod,rel}2ix.json,
    clinical_joint.py:443-453 + :466-467)."""
    ex = models.TorchJointExtractor(model_dir)
    vocabs = dict(ex._vocabs)
    out = tmp_path / "deployed"
    models.save_artifacts(ex._model, ex._tokenizer, vocabs, str(out))
    for fname in ("model.pt", "vocab.txt", "ner2ix.json", "mod2ix.json",
                  "rel2ix.json"):
        assert (out / fname).exists(), fname
    ex2 = models.TorchJointExtractor(str(out))
    assert ex2._vocabs == vocabs
    assert ex2.subword_vocab == ex.subword_vocab
    assert ex2.annotate_sentence(SENT) == ex.annotate_sentence(SENT)


def test_save_artifacts_missing_vocab_fails_fast(model_dir, tmp_path):
    ex = models.TorchJointExtractor(model_dir)
    bad = {"ner2ix": {}, "mod2ix": {}}  # rel2ix missing
    with pytest.raises(ValueError, match="rel2ix"):
        models.save_artifacts(ex._model, ex._tokenizer, bad, str(tmp_path / "x"))
