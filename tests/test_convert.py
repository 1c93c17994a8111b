"""Batch XML <-> CONLL conversion (data_converter.py CLI modes): round-trip
parity on the fixture corpus, driver-level and through the CLI."""

import pytest
from pyspark.sql import functions as F

from jamie_spark import cli, conll, convert, fixtures, infer, xml_io


@pytest.fixture(scope="module")
def ann(spark):
    pages = fixtures.pages_df(spark, 50, seed=42)
    return infer.annotate_pages(pages).cache()


def _parse_conll_map(df, col="conll"):
    out = {}
    for r in df.collect():
        for row in conll.parse_conll(r[col]):
            out[(row["url"], row["sent_id"])] = row
    return out


def test_xml_to_conll_round_trip(spark, ann):
    """annotations -> XML -> conll must reproduce the direct conll emit:
    tokens/ner/mod exactly, per-token relation multisets equal."""
    direct = _parse_conll_map(conll.annotations_to_conll(ann))
    via_xml = _parse_conll_map(
        convert.xml_to_conll(
            xml_io.annotations_to_xml(ann).withColumnRenamed("url", "url")
        )
    )
    assert set(direct) == set(via_xml)
    for key, d in direct.items():
        v = via_xml[key]
        assert v["tokens"] == d["tokens"], key
        assert v["ner"] == d["ner"], key
        assert v["mod"] == d["mod"], key
        for i in range(len(d["tokens"])):
            # both writers pad empty cells as (['N'], [i]) — compare the
            # non-null relation multisets
            got = sorted(
                (r, h) for r, h in zip(v["rels"][i], v["heads"][i]) if r != "N"
            )
            want = sorted(
                (r, h) for r, h in zip(d["rels"][i], d["heads"][i]) if r != "N"
            )
            assert got == want, (key, i)


def test_conll_to_xml_round_trip(spark, ann):
    """annotations -> conll -> XML must equal the direct XML emit byte for
    byte (same tid/rid assignment order by construction)."""
    direct = {r["url"]: r["xml"] for r in xml_io.annotations_to_xml(ann).collect()}
    via = {
        r["url"]: r["xml"]
        for r in convert.conll_to_xml(conll.annotations_to_conll(ann)).collect()
    }
    assert direct == via


def test_cli_converter_modes(spark, ann, tmp_path):
    """The reference data_converter CLI surface: a directory of .xml files
    -> conll parquet -> back to XML, mentions and relations preserved."""
    xml_rows = xml_io.annotations_to_xml(ann).collect()[:10]
    src = tmp_path / "xmls"
    src.mkdir()
    originals = {}
    for i, r in enumerate(xml_rows):
        name = f"doc{i}.xml"
        (src / name).write_text(r["xml"])
        originals[name] = r["xml"]

    out1 = str(tmp_path / "conll_pq")
    assert cli.main(["--mode", "xml2conll", "--in", str(src),
                     "--out", out1]) == 0
    conll_df = spark.read.parquet(out1)
    assert conll_df.count() == 10

    out2 = str(tmp_path / "xml_pq")
    assert cli.main(["--mode", "conll2xml", "--in", out1,
                     "--input-format", "parquet", "--out", out2]) == 0
    back = {r["url"]: r["xml"] for r in spark.read.parquet(out2).collect()}

    for name, xml in originals.items():
        got_m, got_r = xml_io.parse_xml_doc(back[name])
        want_m, want_r = xml_io.parse_xml_doc(xml)
        key = lambda m: (m["sent_id"], m["begin_char"], m["tag"],  # noqa: E731
                         m["surface"], m["mod"])
        assert sorted(map(key, got_m)) == sorted(map(key, want_m)), name
        rkey = lambda r: (r["arg1_tid"], r["arg2_tid"], r["reltype"])  # noqa: E731
        assert sorted(map(rkey, got_r)) == sorted(map(rkey, want_r)), name


def test_xml2conll_drops_cross_sentence_relations():
    """Per-sentence CONLL cannot express cross-line relations (doc-level
    trunk XML can contain them): they must be DROPPED, never written with a
    foreign sentence's token index."""
    xml = (
        '<d tid="T1">肺癌</d>と<a tid="T2">胃</a>を認める。\n'
        '<a tid="T3">肺</a>の所見。\n'
        '<brel rid="R1" arg1="T1" arg2="T2" reltype="region" />\n'
        '<brel rid="R2" arg1="T1" arg2="T3" reltype="region" />\n'
    )
    rows = conll.parse_conll(convert.xml_doc_to_conll("u", xml))
    s0, s1 = rows[0], rows[1]
    # intra-sentence relation kept: 肺癌 anchor (token 0) -> 胃 anchor
    anchor = s0["ner"].index("B-d")
    assert s0["rels"][anchor] == ["region"]
    assert s0["heads"][anchor] == [s0["tokens"].index("胃")]
    # cross-sentence relation dropped entirely; sentence 1 untouched
    assert all(r == ["N"] for i, r in enumerate(s1["rels"]))


def test_mention_with_ascii_space_spans_correctly():
    """Mentions whose surface contains ASCII spaces (the tokenizer drops
    them) must still map to the exact token span — the length walk used to
    overshoot into following tokens."""
    xml = '<d tid="T1">acute MI</d> found today。\n'
    rows = conll.parse_conll(convert.xml_doc_to_conll("u", xml))
    s0 = rows[0]
    assert s0["tokens"][:2] == ["acute", "MI"]
    assert s0["ner"][:3] == ["B-d", "I-d", "O"]  # span exactly 2 tokens


def test_rel_lines_before_sentences_do_not_shift_sent_ids():
    """Standoff rows placed BEFORE the text lines (legal in the grammar)
    must not shift sentence ids or crash the converter."""
    xml = (
        '<brel rid="R1" arg1="T1" arg2="T2" reltype="region" />\n'
        '<d tid="T1">肺癌</d>と<a tid="T2">胃</a>。\n'
    )
    mentions, relations = xml_io.parse_xml_doc(xml)
    assert {m["sent_id"] for m in mentions} == {0}
    rows = conll.parse_conll(convert.xml_doc_to_conll("u", xml))
    anchor = rows[0]["ner"].index("B-d")
    assert rows[0]["rels"][anchor] == ["region"]


def test_converter_isolates_malformed_documents(spark):
    """One malformed document must be skipped, not kill the batch job."""
    docs = spark.createDataFrame(
        [
            ("good", '<d tid="T1">肺癌</d>を認める。\n'),
            ("bad", "</d></d> broken <unclosed\n"),
        ],
        "url string, xml string",
    )
    out = convert.xml_to_conll(docs).collect()
    assert [r["url"] for r in out] == ["good"]
