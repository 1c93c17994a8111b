"""S7: i2b2-style standoff ingestion (formater.py semantics as joins)."""

import pytest

from jamie_spark import i2b2
from jamie_spark.bio import bio_to_spans, mention_triplets


def test_parse_lines():
    assert i2b2.parse_con_line('c="chest pain" 1:0 1:1||t="problem"') == (1, 0, 2, "d")
    assert i2b2.parse_ast_line(
        'c="chest pain" 1:0 1:1||t="problem"||a="absent"'
    ) == (1, 2, "negative")
    assert i2b2.parse_rel_line(
        'c="aspirin" 2:0 2:0||r="TrIP"||c="pain" 2:3 2:3'
    ) == (2, 1, 2, 4, "TrIP")
    assert i2b2.parse_con_line("garbage") is None


@pytest.fixture(scope="module")
def corpus(spark):
    txt = spark.createDataFrame(
        [
            (1, 1, "patient reports chest pain today"),
            (1, 2, "aspirin was given for pain"),
            (2, 1, "blood test was normal"),
        ],
        "doc_id long, line_no int, line string",
    )
    con = spark.createDataFrame(
        [
            (1, 'c="chest pain" 1:2 1:3||t="problem"'),
            (1, 'c="aspirin" 2:0 2:0||t="treatment"'),
            (1, 'c="pain" 2:4 2:4||t="problem"'),
            (2, 'c="blood test" 1:0 1:1||t="test"'),
        ],
        "doc_id long, line string",
    )
    ast = spark.createDataFrame(
        [
            (1, 'c="chest pain" 1:2 1:3||t="problem"||a="present"'),
            (1, 'c="pain" 2:4 2:4||t="problem"||a="absent"'),
        ],
        "doc_id long, line string",
    )
    rel = spark.createDataFrame(
        [(1, 'c="aspirin" 2:0 2:0||r="TrIP"||c="pain" 2:4 2:4')],
        "doc_id long, line string",
    )
    return txt, con, ast, rel


def test_load_i2b2_end_to_end(spark, corpus):
    out = {(r["url"], r["sent_id"]): r for r in i2b2.load_i2b2(*corpus).collect()}
    assert len(out) == 3

    s0 = out[("i2b2://doc/1", 0)]
    assert list(s0["tokens"]) == ["patient", "reports", "chest", "pain", "today"]
    assert bio_to_spans(list(s0["ner"])) == [("d", 2, 4)]
    assert s0["mod"][3] == "positive"  # span-final modality

    s1 = out[("i2b2://doc/1", 1)]
    assert bio_to_spans(list(s1["ner"])) == [("r", 0, 1), ("d", 4, 5)]
    assert s1["mod"][4] == "negative"
    triples = mention_triplets(
        list(s1["tokens"]), list(s1["ner"]),
        [list(x) for x in s1["rels"]], [[int(i) for i in x] for x in s1["heads"]],
    )
    assert triples == [("aspirin", "pain", "TrIP")]

    s2 = out[("i2b2://doc/2", 0)]
    assert bio_to_spans(list(s2["ner"])) == [("t-test", 0, 2)]
    assert s2["mod"][1] == "_"  # no assertion row
