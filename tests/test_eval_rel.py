"""Strict-span / relaxed relation eval (E3 variants, reference
clinical_eval.py:135-143): fixture-corpus parity plus perturbation tests
proving the three relation evals are genuinely different gates."""

import pytest
from pyspark.sql import functions as F

from jamie_spark import eval as ev, fixtures, infer, mentions as mm

ANN_DDL = infer.ANNOTATIONS_DDL

N_DOCS = 60
SEED = 42


@pytest.fixture(scope="module")
def fix(spark):
    pages = fixtures.pages_df(spark, N_DOCS, SEED)
    gold_m, gold_r, gold_t = fixtures.gold_dfs(spark, N_DOCS, SEED)
    ann = infer.annotate_pages(pages).cache()
    return {"ann": ann, "gold_m": gold_m.cache(), "gold_r": gold_r,
            "gold_t": gold_t}


def _gold_detailed(gold_m, gold_r):
    """Gold relations (tid pairs) -> span-keyed detailed triples."""
    t = gold_m.select(
        "url", F.col("tid").alias("arg1_tid"), F.col("sent_id"),
        F.col("begin_tok").alias("tail_begin"), F.col("end_tok").alias("tail_end"),
    )
    h = gold_m.select(
        "url", F.col("tid").alias("arg2_tid"),
        F.col("begin_tok").alias("head_begin"), F.col("end_tok").alias("head_end"),
    )
    return (
        gold_r.join(t, ["url", "arg1_tid"]).join(h, ["url", "arg2_tid"])
        .select("url", "sent_id", "tail_begin", "tail_end",
                "head_begin", "head_end", F.col("reltype").alias("rel"))
    )


def _gold_tok(gold_m, gold_r):
    t = gold_m.select(
        "url", F.col("tid").alias("arg1_tid"), "sent_id",
        (F.col("end_tok") - 1).alias("tail_id"),
    )
    h = gold_m.select(
        "url", F.col("tid").alias("arg2_tid"),
        (F.col("end_tok") - 1).alias("head_id"),
    )
    return (
        gold_r.join(t, ["url", "arg1_tid"]).join(h, ["url", "arg2_tid"])
        .select("url", "sent_id", "tail_id", "head_id",
                F.col("reltype").alias("rel"))
    )


def test_strict_and_relax_perfect_on_fixture(spark, fix):
    """Pipeline detailed/token triples == gold under both evals (P/R = 1.0),
    including the DCT self-loops."""
    strict = ev.eval_rel_strict(
        _gold_detailed(fix["gold_m"], fix["gold_r"]),
        mm.detailed_triples(fix["ann"]),
    )
    assert strict["precision"] == pytest.approx(1.0)
    assert strict["recall"] == pytest.approx(1.0)
    relax = ev.eval_rel_relax(
        _gold_tok(fix["gold_m"], fix["gold_r"]),
        mm.rel_token_triples(fix["ann"]),
    )
    assert relax["precision"] == pytest.approx(1.0)
    assert relax["recall"] == pytest.approx(1.0)


def _ann_df(spark, rows):
    return spark.createDataFrame(rows, ANN_DDL)


def _sent(url, rels, heads, ner, tokens, entities, triples):
    return {
        "url": url, "sent_id": 0, "chunk_id": 0, "tokens": tokens, "ner": ner,
        "mod": ["_"] * len(tokens), "rels": rels, "heads": heads,
        "entities": entities, "triples": triples,
    }


def test_strict_fails_where_mention_string_passes(spark):
    """Two same-surface entities: prediction swaps which one heads the
    relation. Mention-string eval cannot see the error; strict (and relax)
    must."""
    tokens = ["X", "a", "X"]
    ner = ["B-d", "O", "B-d"]
    ents = [
        {"tag": "d", "begin": 0, "end": 1, "mod": "_", "surface": "X"},
        {"tag": "d", "begin": 2, "end": 3, "mod": "_", "surface": "X"},
    ]
    trip = [{"tail_surface": "X", "head_surface": "X", "rel": "on",
             "tail_tag": "d", "head_tag": "d", "tail_mod": "_"}]
    gold = _ann_df(spark, [_sent("u", [["on"], [], []], [[2], [], []],
                                 ner, tokens, ents, trip)])
    pred = _ann_df(spark, [_sent("u", [[], [], ["on"]], [[], [], [0]],
                                 ner, tokens, ents, trip)])
    full = ev.mhs_eval(gold, pred)
    assert full["rel_mention"]["f1"] == pytest.approx(1.0)  # blind to swap
    assert full["rel_strict"]["f1"] == 0.0
    assert full["rel_relax"]["f1"] == 0.0


def test_relax_passes_where_strict_fails(spark):
    """Prediction finds the right anchor tokens but the wrong span start:
    relax credits it, strict does not."""
    tokens = ["X", "Y", "b", "Z"]
    gold_ner = ["B-d", "I-d", "O", "B-a"]
    pred_ner = ["O", "B-d", "O", "B-a"]
    gold_ents = [
        {"tag": "d", "begin": 0, "end": 2, "mod": "_", "surface": "XY"},
        {"tag": "a", "begin": 3, "end": 4, "mod": "_", "surface": "Z"},
    ]
    pred_ents = [
        {"tag": "d", "begin": 1, "end": 2, "mod": "_", "surface": "Y"},
        {"tag": "a", "begin": 3, "end": 4, "mod": "_", "surface": "Z"},
    ]
    rels = [[], ["region"], [], []]
    heads = [[], [3], [], []]
    gold = _ann_df(spark, [_sent("u", rels, heads, gold_ner, tokens,
                                 gold_ents, [])])
    pred = _ann_df(spark, [_sent("u", rels, heads, pred_ner, tokens,
                                 pred_ents, [])])
    relax = ev.eval_rel_relax(
        mm.rel_token_triples(gold), mm.rel_token_triples(pred)
    )
    strict = ev.eval_rel_strict(
        mm.detailed_triples(gold), mm.detailed_triples(pred)
    )
    assert relax["f1"] == pytest.approx(1.0)
    assert strict["f1"] == 0.0


def test_non_span_final_anchor_falls_back_to_single_token(spark):
    """detailed_triples: an anchor with no span ending there becomes the
    (id, id+1) span — reference data_objects.py:246-247."""
    tokens = ["X", "b", "Z"]
    ner = ["O", "O", "B-a"]
    ents = [{"tag": "a", "begin": 2, "end": 3, "mod": "_", "surface": "Z"}]
    ann = _ann_df(spark, [_sent("u", [["r"], [], []], [[2], [], []],
                                ner, tokens, ents, [])])
    rows = mm.detailed_triples(ann).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["tail_begin"], r["tail_end"]) == (0, 1)  # fallback
    assert (r["head_begin"], r["head_end"]) == (2, 3)  # real span


def test_train_dev_split_per_document(spark):
    """R9: seeded per-document split — disjoint, exhaustive, document-atomic,
    deterministic, and near the requested ratio."""
    rows = [(f"https://d/{i}", s) for i in range(400) for s in range(3)]
    df = spark.createDataFrame(rows, "url string, sent_id int")
    train, dev = ev.train_dev_split(df, dev_ratio=0.1, seed=5)
    n_train, n_dev = train.count(), dev.count()
    assert n_train + n_dev == len(rows)
    # document-atomic: no url on both sides
    both = train.select("url").distinct().join(
        dev.select("url").distinct(), "url"
    )
    assert both.count() == 0
    assert 0.05 <= n_dev / len(rows) <= 0.17  # ~10% of 400 docs
    # deterministic
    t2, d2 = ev.train_dev_split(df, dev_ratio=0.1, seed=5)
    assert d2.count() == n_dev
