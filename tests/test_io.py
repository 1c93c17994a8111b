"""Reference-parity I/O format tests: CONLL (S4/S8) and annotated XML (S9)."""

import pytest
from pyspark.sql import functions as F

from jamie_spark import conll, fixtures, pipeline, xml_io


@pytest.fixture(scope="module")
def extracted(spark):
    pages = fixtures.pages_df(spark, 40, seed=5)
    out = pipeline.run_extraction(pages)
    out["annotations"] = out["annotations"].cache()
    return out


def test_conll_roundtrip(spark, extracted):
    """annotations -> CONLL text -> parse == original columns."""
    docs = conll.annotations_to_conll(extracted["annotations"]).collect()
    assert len(docs) > 0
    orig = {
        (r["url"], r["sent_id"]): r
        for r in extracted["annotations"].collect()
    }
    n_sents = 0
    for doc in docs:
        for row in conll.parse_conll(doc["conll"]):
            key = (row["url"], row["sent_id"])
            o = orig[key]
            assert row["tokens"] == list(o["tokens"])
            assert row["ner"] == list(o["ner"])
            assert row["mod"] == list(o["mod"])
            # writer pads empty cells with the reference defaults ['N']/[self]
            for i, (rl, hl) in enumerate(zip(o["rels"], o["heads"])):
                exp_r = list(rl) if list(rl) else ["N"]
                exp_h = [int(x) for x in hl] if list(hl) else [i]
                assert row["rels"][i] == exp_r
                assert row["heads"][i] == exp_h
            n_sents += 1
    assert n_sents == len(orig)


def test_conll_jasp_sep_roundtrip():
    """A raw U+3000 token is written in-band and read back verbatim as [JASP]
    (the engine's internal representation; XML emit decodes it)."""
    lines = conll.sentence_to_conll_lines(
        ["肺", "　", "癌"], ["B-a", "O", "B-d"], ["_", "_", "positive"],
        [[], [], []], [[], [], []],
    )
    assert "[JASP]" in lines[1]
    parsed = conll.parse_conll("#doc u\n## line 0\n" + "\n".join(lines))
    assert parsed[0]["tokens"] == ["肺", "[JASP]", "癌"]


def test_xml_writer_semantics(spark, extracted):
    """XML output: inline tags, modality family attributes, DCT-Rel
    attributes, standoff brel/trel rows with correct tid wiring."""
    xml_df = xml_io.annotations_to_xml(extracted["annotations"])
    rows = {r["url"]: r["xml"] for r in xml_df.collect()}
    assert rows
    joined = "\n".join(rows.values())
    assert "certainty=\"" in joined
    assert "<brel " in joined or "<trel " in joined
    # DCT self-loops appear as attributes, not standoff rows
    for xml in rows.values():
        for line in xml.splitlines():
            if line.startswith(("<brel", "<trel")):
                attrs = dict(xml_io._ATTR_RE.findall(line))
                assert attrs["arg1"] != attrs["arg2"]


def test_xml_roundtrip_triples(spark, extracted):
    """XML -> parse -> relation triples == pipeline mention triples."""
    from jamie_spark import mentions as mm

    xml_df = xml_io.annotations_to_xml(extracted["annotations"])
    got = []
    for r in xml_df.collect():
        mentions, relations = xml_io.parse_xml_doc(r["xml"])
        by_tid = {m["tid"]: m for m in mentions}
        for rel in relations:
            got.append(
                (
                    r["url"],
                    by_tid[rel["arg1_tid"]]["surface"],
                    rel["reltype"],
                    by_tid[rel["arg2_tid"]]["surface"],
                )
            )
    expected = [
        (t["url"], t["subj_surface"], t["pred"], t["obj_surface"])
        for t in mm.triples_from_annotations(extracted["annotations"]).collect()
    ]
    assert sorted(got) == sorted(expected)


def test_xml_multiple_rel_types_same_pair():
    """Two relation labels on the same entity pair must both be emitted
    (the reference's span2rel dict drops all but the last — fixed here)."""
    sentences = [
        {
            "sent_id": 0,
            "tokens": ["肺癌", "は", "肺", "に"],
            "entities": [
                {"tag": "d", "begin": 0, "end": 1, "mod": "positive"},
                {"tag": "a", "begin": 2, "end": 3, "mod": "_"},
            ],
            "detailed_triples": [
                {"tail_begin": 0, "tail_end": 1, "head_begin": 2, "head_end": 3,
                 "rel": "region"},
                {"tail_begin": 0, "tail_end": 1, "head_begin": 2, "head_end": 3,
                 "rel": "feature"},
            ],
        }
    ]
    xml = xml_io.doc_to_xml(sentences)
    assert 'reltype="region"' in xml and 'reltype="feature"' in xml


def test_xml_tag_like_text_roundtrips():
    """Page text legitimately contains < > & (extract_text unescapes
    entities); the writer must escape it so the round-trip parser doesn't
    read it as markup — '</p>' in text used to crash the parser with a
    stack underflow."""
    sentences = [
        {
            "sent_id": 0,
            "tokens": ["<", "/", "p", ">", "肺癌", "&", "x"],
            "entities": [{"tag": "d", "begin": 4, "end": 5, "mod": "_"}],
            "detailed_triples": [],
        }
    ]
    xml = xml_io.doc_to_xml(sentences)
    mentions, relations = xml_io.parse_xml_doc(xml)
    assert [m["surface"] for m in mentions] == ["肺癌"]
    # begin_char is an offset into the TRUE (unescaped) text
    assert mentions[0]["begin_char"] == len("</p>")


def test_xml_to_conll_unescapes_entities():
    """xml2conll must unescape the tag-stripped lines: parse_xml_doc
    reports begin_char in UNESCAPED space, so an escaped '&' earlier in
    the line used to shift every later offset, silently dropping the
    entity and leaking literal '&amp;' into the CONLL tokens."""
    from jamie_spark import convert

    sentences = [
        {
            "sent_id": 0,
            "tokens": ["A&B", "に", "頭痛"],
            "entities": [{"tag": "d", "begin": 2, "end": 3, "mod": "_"}],
            "detailed_triples": [],
        }
    ]
    xml = xml_io.doc_to_xml(sentences)
    conll_text = convert.xml_doc_to_conll("u", xml)
    assert "amp" not in conll_text
    assert "B-d" in conll_text  # the entity survived the round trip


def test_xml_newline_in_token_roundtrips():
    """A doc-mode token containing a decoded [SEP] newline must not split
    the line-oriented XML — emitted raw it crashed the parser with a
    stack underflow; it is encoded as &#10; and decoded on parse."""
    sentences = [
        {
            "sent_id": 0,
            "tokens": ["頭\n痛", "あり"],
            "entities": [{"tag": "d", "begin": 0, "end": 1, "mod": "_"}],
            "detailed_triples": [],
        }
    ]
    xml = xml_io.doc_to_xml(sentences)
    assert "\n頭" not in xml.split("\n")[0]  # no raw newline inside line 0
    mentions, _ = xml_io.parse_xml_doc(xml)
    assert [m["surface"] for m in mentions] == ["頭\n痛"]


def test_xml_unknown_mod_label_does_not_crash():
    """A modality label outside MOD_DICT (foreign provider) falls back to a
    generic attribute family instead of KeyError-ing the document."""
    sentences = [
        {
            "sent_id": 0,
            "tokens": ["肺癌"],
            "entities": [{"tag": "d", "begin": 0, "end": 1,
                          "mod": "uncertain-custom"}],
            "detailed_triples": [],
        }
    ]
    xml = xml_io.doc_to_xml(sentences)
    assert 'mod="uncertain-custom"' in xml
    mentions, _ = xml_io.parse_xml_doc(xml)
    assert mentions[0]["mod"] == "uncertain-custom"
    txt, ann = xml_io.doc_to_brat(sentences)
    assert "mod T1 uncertain-custom" in ann


def test_brat_offsets_and_relations(spark, extracted):
    """Brat standoff: char offsets index the .txt exactly; relation rows wire
    span-final anchors; DCT self-loops become A rows (data_objects.py:312-361
    semantics)."""
    brat = xml_io.annotations_to_brat(extracted["annotations"])
    n_rel_rows = 0
    for r in brat.collect():
        txt, ann = r["txt"], r["ann"]
        tid_surface = {}
        for line in ann.strip().split("\n"):
            if line.startswith("T"):
                tid, mid_part, surface = line.split("\t")
                _, b, e = mid_part.rsplit(" ", 2)
                assert txt[int(b):int(e)] == surface, (r["url"], line)
                tid_surface[tid] = surface
            elif line.startswith("R"):
                n_rel_rows += 1
                _, body = line.split("\t")
                _, a1, a2 = body.split(" ")
                assert a1.split(":")[1] in tid_surface
                assert a2.split(":")[1] in tid_surface
    assert n_rel_rows > 0
    # DCT self-loops present as attribute rows
    all_ann = "\n".join(r["ann"] for r in brat.collect())
    assert "DCT-Rel" in all_ann


def test_xml_mod_attributes_roundtrip(spark, extracted):
    xml_df = xml_io.annotations_to_xml(extracted["annotations"])
    n_mod = 0
    for r in xml_df.collect():
        mentions, _ = xml_io.parse_xml_doc(r["xml"])
        for m in mentions:
            if m["mod"] != "_":
                n_mod += 1
    gold_mod = (
        extracted["mentions"].where(F.col("mod_tag") != "_").count()
    )
    assert n_mod == gold_mod


def test_ntriples_escaping_and_iri_objects(spark, tmp_path):
    from jamie_spark import graph

    rows = [
        ("s1", "rel", 'he said "hi"\nline\\path\ttab'),
        ("s two", "rel", "C000123"),
    ]
    df = spark.createDataFrame(
        rows, "subj_id string, pred string, obj_id string"
    )
    lines = {r["line"] for r in graph.to_ntriples(df).collect()}
    assert (
        '<http://example.org/kg/entity/s1> <http://example.org/kg/pred/rel> '
        '"he said \\"hi\\"\\nline\\\\path\\ttab" .'
    ) in lines
    # canonical C-ids publish as IRIs; subject spaces percent-encode (%20,
    # NOT the form-encoding '+', which a percent-decoder would keep literal)
    assert (
        '<http://example.org/kg/entity/s%20two> <http://example.org/kg/pred/rel> '
        '<http://example.org/kg/entity/C000123> .'
    ) in lines
    # every emitted line is single-line (the point of the escaping)
    assert all("\n" not in ln for ln in lines)

    out = str(tmp_path / "nt_out")
    graph.write_ntriples(df, out)
    back = {r["value"] for r in spark.read.text(out).collect()}
    assert back == lines
