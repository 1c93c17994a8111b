"""Unit tests for the pure-Python core (no Spark session needed)."""

from jamie_spark import bio, textnorm
from jamie_spark.fixtures import gen_corpus
from jamie_spark.standin import StandInJointExtractor
from jamie_spark.tokenizer import split_sentences, tokenize, tokenize_text


# --- BIO algebra (reference data_objects.py:44-70 semantics) ---------------

def test_bio_to_spans_basic():
    assert bio.bio_to_spans(["B-d", "I-d", "O", "B-a"]) == [("d", 0, 2), ("a", 3, 4)]


def test_bio_to_spans_pathological_i_start():
    # span starting with I- is tolerated (reference data_objects.py:60-61)
    assert bio.bio_to_spans(["I-d", "I-d", "O"]) == [("d", 0, 2)]
    assert bio.bio_to_spans(["O", "I-d"]) == [("d", 1, 2)]


def test_bio_to_spans_tag_switch_inside_i_run():
    # I-tag switch closes previous span (reference data_objects.py:56-59)
    assert bio.bio_to_spans(["B-d", "I-a"]) == [("d", 0, 1), ("a", 1, 2)]


def test_bio_to_spans_b_after_b():
    assert bio.bio_to_spans(["B-d", "B-d"]) == [("d", 0, 1), ("d", 1, 2)]


def test_bio_roundtrip():
    tags = ["O", "B-d", "I-d", "B-a", "O", "B-TIMEX3", "I-TIMEX3"]
    spans = bio.bio_to_spans(tags)
    assert bio.spans_to_bio(len(tags), spans) == tags


def test_mention_triplets_skips_non_final_anchor():
    toks = ["肺", "癌", "x"]
    ner = ["B-d", "I-d", "O"]
    # anchor on token 0 (not span-final) must be dropped
    # (reference data_objects.py:260-264)
    rels = [["region"], [], []]
    heads = [[1], [], []]
    assert bio.mention_triplets(toks, ner, rels, heads) == []
    rels2 = [[], ["region"], []]
    heads2 = [[1], [1], []]
    assert bio.mention_triplets(toks, ner, rels2, heads2) == [("肺癌", "肺癌", "region")]


# --- width normalization -----------------------------------------------------

def test_zen_to_han_ascii_only():
    assert textnorm.zen_to_han("ＡＢＣ１２３") == "ABC123"
    # kana + ideographic space untouched (mojimoji kana=False semantics)
    assert textnorm.zen_to_han("カナ　ひらがな") == "カナ　ひらがな"
    assert textnorm.han_to_zen(textnorm.zen_to_han("ＤＭ")) == "ＤＭ"


# --- extraction byte-identity -----------------------------------------------

def test_extract_text_byte_identical():
    pages, _, _, _ = gen_corpus(100, seed=42)
    for p in pages:
        assert textnorm.extract_text(p["html"]) == p["text"], p["url"]


def test_extract_text_total_on_garbage():
    assert textnorm.extract_text(None) == ""
    assert textnorm.extract_text(b"\xff\xfe\x00") == ""
    assert textnorm.extract_text("<html>no article</html>") == ""


# --- tokenizer ---------------------------------------------------------------

def test_split_sentences():
    assert split_sentences("A。B！\nC") == ["A。", "B！", "C"]


def test_split_sentences_after_width_normalization():
    """The pipeline normalizes width BEFORE splitting (infer applies
    zen_to_han first), so ASCII !/? must end sentences too — full-width
    ！？ alone never fire on the real path. Regression: '痛い！頭痛あり。'
    came back as ONE sentence, merging sentence ids and letting the
    per-sentence relation rules fire across the boundary."""
    from jamie_spark.textnorm import zen_to_han

    assert split_sentences(zen_to_han("痛い！頭痛あり。")) == [
        "痛い!",
        "頭痛あり。",
    ]
    assert split_sentences("ok?next。") == ["ok?", "next。"]


def test_tokenize_char_classes():
    assert tokenize("左肺に肺癌を認める。") == ["左肺", "に", "肺癌", "を", "認", "める", "。"]
    assert tokenize("血圧は120mmHgであった。") == ["血圧", "は", "120mmHg", "であった", "。"]
    assert tokenize("肺　癌") == ["肺", "[JASP]", "癌"]


# --- stand-in tagger == gold (the P/R gate core, pure form) ------------------

def test_chunk_sentences_greedy():
    from jamie_spark.tokenizer import chunk_sentences

    # packs greedily; oversized sentence becomes its own chunk
    assert chunk_sentences([100, 200, 200], max_len=510) == [(0, 3)]
    assert chunk_sentences([100, 200, 300], max_len=510) == [(0, 2), (2, 3)]
    assert chunk_sentences([400, 200, 300], max_len=510) == [(0, 1), (1, 3)]
    assert chunk_sentences([600, 100], max_len=510) == [(0, 1), (1, 2)]
    assert chunk_sentences([], max_len=510) == []
    # zero-length sentences: tiling holds, oversized still isolated
    assert chunk_sentences([600, 0], max_len=510) == [(0, 1), (1, 2)]
    assert chunk_sentences([0, 600], max_len=510) == [(0, 1), (1, 2)]
    assert chunk_sentences([0, 0], max_len=510) == [(0, 2)]
    assert chunk_sentences([510, 510], max_len=510) == [(0, 1), (1, 2)]
    # chunks tile the document exactly
    lens = [123, 456, 1, 510, 44, 509, 2]
    chunks = chunk_sentences(lens, max_len=510)
    assert chunks[0][0] == 0 and chunks[-1][1] == len(lens)
    assert all(a[1] == b[0] for a, b in zip(chunks, chunks[1:]))
    assert all(
        sum(lens[b:e]) <= 510 or e - b == 1 for b, e in chunks
    )


def test_standin_matches_gold_annotations():
    pages, gold_m, _, gold_t = gen_corpus(200, seed=42)
    tagger = StandInJointExtractor()
    pred_m, pred_t = [], []
    for p in pages:
        if p["lang"] != "ja":
            continue
        for sid, toks in enumerate(tokenize_text(p["text"])):
            ner, mod, rels, heads = tagger.annotate_sentence(toks)
            for tag, b, e, m in bio.mod_entities(ner, mod):
                pred_m.append((p["url"], sid, b, e, tag, m))
            for s, o, r in bio.mention_triplets(toks, ner, rels, heads):
                pred_t.append((p["url"], sid, s, r, o))
    gm = sorted(
        (r["url"], r["sent_id"], r["begin_tok"], r["end_tok"], r["ner_tag"], r["mod_tag"])
        for r in gold_m
    )
    gt = sorted(
        (r["url"], r["sent_id"], r["subj_surface"], r["pred"], r["obj_surface"])
        for r in gold_t
    )
    assert sorted(pred_m) == gm
    assert sorted(pred_t) == gt
    assert len(gt) > 100  # corpus is non-trivial


def test_corpus_deterministic():
    a = gen_corpus(30, seed=9)
    b = gen_corpus(30, seed=9)
    assert a == b
