"""T5-T10 subword alignment semantics (pure, no Spark)."""

from jamie_spark import subword as sw

VOCAB = {
    "肺", "##癌", "糖", "##尿", "##病", "アスピリン", "を", "に",
    "認", "##める", "120", "##mm", "##Hg",
}


def test_wordpiece_greedy_longest():
    assert sw.wordpiece("肺癌", VOCAB) == ["肺", "##癌"]
    assert sw.wordpiece("糖尿病", VOCAB) == ["糖", "##尿", "##病"]
    assert sw.wordpiece("アスピリン", VOCAB) == ["アスピリン"]
    assert sw.wordpiece("未知語", VOCAB) == ["[UNK]"]


def test_tokenize_and_restore_unk():
    tokens = ["肺癌", "未知語", "を"]
    sbw, wid = sw.tokenize_subwords(tokens, VOCAB)
    assert sbw == ["肺", "##癌", "[UNK]", "を"]
    assert wid == [0, 0, 1, 2]
    assert sw.restore_unk(sbw, wid, tokens) == ["肺", "##癌", "未知語", "を"]


def test_expand_ner_labels():
    # B- stays on first subword, continuations become I- (utils.py:117-125)
    labels = ["B-d", "O", "O"]
    _, wid = sw.tokenize_subwords(["肺癌", "未知語", "を"], VOCAB)
    assert sw.expand_ner_labels(labels, wid) == ["B-d", "I-d", "O", "O"]


def test_shift_mod_labels_to_last_subword():
    mods = ["positive", "_", "_"]
    _, wid = sw.tokenize_subwords(["肺癌", "未知語", "を"], VOCAB)
    assert sw.shift_mod_labels(mods, wid) == ["_", "positive", "_", "_"]


def test_expand_masks():
    _, wid = sw.tokenize_subwords(["肺癌", "を"], VOCAB)
    assert sw.expand_masks([1, 0], wid) == [1, 1, 0]


def test_collapse_roundtrip():
    """word -> subword -> word is lossless for labels, mods and relations."""
    tokens = ["糖尿病", "を", "認める"]
    ner = ["B-d", "O", "O"]
    mod = ["suspicious", "_", "_"]
    rels = [["region"], [], []]
    heads = [[0], [], []]  # self-loop anchored on word 0

    sbw, wid = sw.tokenize_subwords(tokens, VOCAB)
    sbw_ner = sw.expand_ner_labels(ner, wid)
    sbw_mod = sw.shift_mod_labels(mod, wid)
    # relation anchored on the word's last subword, head -> head's last subword
    last_sbw_of_word = {w: i for i, w in enumerate(wid)}
    sbw_rels: list[list[str]] = [[] for _ in sbw]
    sbw_heads: list[list[int]] = [[] for _ in sbw]
    for w, (rl, hl) in enumerate(zip(rels, heads)):
        for rel, h in zip(rl, hl):
            sbw_rels[last_sbw_of_word[w]].append(rel)
            sbw_heads[last_sbw_of_word[w]].append(last_sbw_of_word[h])

    toks2, ner2, mod2, rels2, heads2 = sw.collapse_to_words(
        sw.restore_unk(sbw, wid, tokens), wid, sbw_ner, sbw_mod, sbw_rels, sbw_heads
    )
    assert toks2 == tokens
    assert ner2 == ner
    assert mod2 == mod
    assert rels2 == rels
    assert heads2 == heads


def test_length_limit():
    assert sw.within_length_limit(["x"] * 510)
    assert not sw.within_length_limit(["x"] * 511)


def test_document_sent_mask_flips_at_sep():
    from jamie_spark.subword import document_sent_mask

    toks = ["[CLS]", "a", "b", "[SEP]", "c", "[SEP]", "d"]
    # reference utils.py:2081-2089: the [SEP] keeps the pre-flip value
    assert document_sent_mask(toks) == [0, 0, 0, 0, 1, 1, 0]
    assert document_sent_mask(["x", "y"]) == [0, 0]
