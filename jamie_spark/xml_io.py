"""Annotated-XML emit + parse (S2/S9 in SURVEY.md §2.1) — the
reference-parity output format for triple comparison.

Writer semantics re-expressed from ``MultiheadConll.doc_to_xml``
(reference ``data_objects.py:267-310``):

* tids assigned in document order over mod-entities (``:272-277``);
* inline tags inserted in REVERSED span order so earlier insertions don't
  shift later offsets (``:288-300``);
* modality becomes the family attribute via MOD_DICT
  (``certainty=\"positive\"`` etc.), ``'_'`` omitted (``:297``);
* a self-loop relation becomes the ``DCT-Rel`` attribute (``:298``);
* standoff relation rows appended at the end: ``<brel rid arg1 arg2
  reltype/>``; ``trel`` when either endpoint is a TIMEX3 (``:307`` — the
  reference literally compares against ``\"Timex3\"`` which its lowercase
  tags never equal, so its runtime output is always ``brel``; we implement
  the documented intent and note the quirk here);
* self-loop (DCT) rows are not emitted as standoff rows (``:308``).

The parser inverts the writer (used for round-trip parity tests; the
reference parses with ElementTree at ``utils.py:683-697`` — we parse our own
grammar with a regex scanner, no XML library needed for this fixed subset).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import pandas as pd

from .concepts import MOD_DICT
from .textnorm import escape_html, unescape_html


def _escape(text: str, in_entity: bool = False) -> str:
    """Token text -> XML-safe: HTML-escape; additionally encode real
    newlines as &#10; when the token sits INSIDE an entity span (a
    doc-mode token can be a decoded [SEP] newline — BETWEEN entities it
    must stay a real newline, that is the doc-mode line structure; inside
    an entity it would split the span across lines and crash the
    line-oriented parser with a stack underflow). Order matters: escaping
    & first means a LITERAL '&#10;' in text becomes '&amp;#10;', which
    contains no '&#10;' substring — so the decode can never confuse the
    two."""
    out = escape_html(text)
    return out.replace("\n", "&#10;") if in_entity else out


def _unescape(text: str) -> str:
    """Inverse of _escape: decode &#10; first (safe per above), then the
    HTML entities."""
    return unescape_html(text.replace("&#10;", "\n"))

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def doc_to_xml(sentences: list[dict]) -> str:
    """Per-document annotations -> annotated XML string.

    ``sentences``: dicts with tokens, entities (tag, begin, end, mod),
    triples as (tail_begin, tail_end, head_begin, head_end, rel) token spans
    per sentence (detailed-triplet shape, reference data_objects.py:240-249).
    """
    tid = 0
    span2tid: dict[tuple[int, int, int], tuple[str, str]] = {}
    # pair -> ordered distinct rel labels. The reference's span2rel dict
    # (data_objects.py:279-280) silently keeps only the LAST label when one
    # pair carries several relation types, while its brat writer keeps all —
    # we emit all distinct labels (one standoff row each) and use the first
    # for the DCT attribute, fixing that inconsistency.
    rels: dict[tuple, list[str]] = {}
    for s in sentences:
        sid = s["sent_id"]
        for e in s["entities"]:
            tid += 1
            span2tid[(sid, e["begin"], e["end"])] = (f"T{tid}", e["tag"])
        for t in s.get("detailed_triples", []):
            key = (sid, t["tail_begin"], t["tail_end"], t["head_begin"], t["head_end"])
            labels = rels.setdefault(key, [])
            if t["rel"] not in labels:
                labels.append(t["rel"])

    lines = []
    for s in sentences:
        sid = s["sent_id"]
        # token text is XML-escaped (tags are inserted between tokens, so
        # only the text needs it): extract_text UNESCAPES entities, so page
        # text legitimately contains < > & — emitted raw they would parse
        # as tags (reproduced: '&lt;/p&gt;' in a page crashed the
        # round-trip parser with a stack underflow). Newlines are encoded
        # only INSIDE entity spans — see _escape.
        covered = set()
        for e in s["entities"]:
            covered.update(range(e["begin"], e["end"]))
        toks = [
            _escape(t, in_entity=(i in covered))
            for i, t in enumerate(s["tokens"])
        ]
        for e in sorted(s["entities"], key=lambda e: e["begin"], reverse=True):
            span = (sid, e["begin"], e["end"])
            t, tag = span2tid[span]
            attrs = f' tid="{t}"'
            if e["mod"] != "_":
                # unknown labels (a foreign provider) fall back to a
                # generic attribute instead of KeyError-ing the document
                attrs += f' {MOD_DICT.get(e["mod"], "mod")}="{e["mod"]}"'
            self_key = (sid, e["begin"], e["end"], e["begin"], e["end"])
            if self_key in rels:
                attrs += f' DCT-Rel="{rels[self_key][0]}"'
            toks.insert(e["end"], f"</{tag}>")
            toks.insert(e["begin"], f"<{tag}{attrs}>")
        lines.append("".join(toks))

    rid = 0
    for (sid, tb, te, hb, he), labels in rels.items():
        if (tb, te) == (hb, he):
            continue  # DCT self-loops live in the attribute, not standoff
        # A real model can anchor a relation on a token that is not span-final
        # (detailed_triplets falls back to a single-token span); such spans
        # were never assigned a tid. Skip them — mirroring mention_triplets'
        # "drop non-span-final anchors" (reference data_objects.py:260) —
        # instead of KeyError-ing the whole document group.
        if (sid, tb, te) not in span2tid or (sid, hb, he) not in span2tid:
            continue
        tail_tid, tail_tag = span2tid[(sid, tb, te)]
        head_tid, head_tag = span2tid[(sid, hb, he)]
        rel_tag = "trel" if "TIMEX3" in (tail_tag, head_tag) else "brel"
        for rel in labels:
            rid += 1
            lines.append(
                f'<{rel_tag} rid="R{rid}" arg1="{tail_tid}" arg2="{head_tid}"'
                f' reltype="{rel}" />'
            )
    return "\n".join(lines) + "\n"


def _rows_to_sentences(pdf: pd.DataFrame) -> list[dict]:
    """Grouped annotation rows -> the per-sentence dict shape both document
    writers (doc_to_xml, doc_to_brat) consume — ONE copy of the in-band
    token decode + detailed-triplet derivation, so the XML and brat exports
    can never disagree on the same annotations."""
    from .bio import detailed_triplets

    sentences = []
    for _, row in pdf.iterrows():
        # decode in-band tokens for text emit (reference data_objects.py:210)
        toks = [
            t.replace("[JASP]", "　").replace("[SEP]", "\n")
            for t in row["tokens"]
        ]
        det = detailed_triplets(
            list(row["ner"]),
            [list(x) for x in row["rels"]],
            [[int(i) for i in x] for x in row["heads"]],
        )
        sentences.append(
            {
                "sent_id": int(row["sent_id"]),
                "tokens": toks,
                "entities": [
                    {
                        "tag": e["tag"],
                        "begin": int(e["begin"]),
                        "end": int(e["end"]),
                        "mod": e["mod"],
                    }
                    for e in row["entities"]
                ],
                "detailed_triples": [
                    {
                        "tail_begin": tb,
                        "tail_end": te,
                        "head_begin": hb,
                        "head_end": he,
                        "rel": rel,
                    }
                    for tb, te, hb, he, rel in det
                ],
            }
        )
    return sentences


def annotations_to_xml(annotations: "DataFrame") -> "DataFrame":
    """annotations -> (url, xml) via one grouped Arrow stage."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sent_id")
        url = pdf["url"].iloc[0]
        sentences = _rows_to_sentences(pdf)
        return pd.DataFrame({"url": [url], "xml": [doc_to_xml(sentences)]})

    return (
        annotations.select(
            "url", "sent_id", "tokens", "ner", "mod", "rels", "heads", "entities"
        )
        .groupBy("url")
        .applyInPandas(build, schema="url string, xml string")
    )


# --- brat writer (S10, reference data_objects.py:312-361) --------------------

def doc_to_brat(sentences: list[dict]) -> tuple[str, str]:
    """Per-document annotations -> (text, ann) brat standoff pair.

    Semantics re-expressed from ``MultiheadConll.doc_to_brat``:

    * ``.txt`` = sentences joined by newline (in-band tokens decoded);
    * entity rows ``T{n}\\t{Tag} {begin_char} {end_char}\\t{surface}`` with
      char offsets into the .txt (``:332-334``), tag mapped through the
      human-readable name table (``NER_DICT`` / tag2name — we use TAG2NAME);
    * modality rows ``A{n}\\t{family} T{e} {label}`` (``:343-345``);
    * relation rows ``R{n}\\t{rel} Arg1:T Arg2:T`` anchored by span-final
      char position (``:349-354``); DCT self-loops become
      ``A{n}\\tDCT-Rel T{e} {rel}`` (``:356-357``).
    """
    from .concepts import TAG2NAME

    txt_lines: list[str] = []
    ann_lines: list[str] = []
    line_start = 0
    eid = mid = rid = 1
    lastchar2eid: dict[int, str] = {}
    # first pass: text + entities (+ modality); relation anchoring happens
    # in the second pass via lastchar2eid (span-final char), not span maps
    for s in sentences:
        toks = s["tokens"]
        sent_str = "".join(toks)
        entity_rows = sorted(s["entities"], key=lambda e: e["begin"])
        for e in entity_rows:
            b_char = line_start + len("".join(toks[: e["begin"]]))
            e_char = line_start + len("".join(toks[: e["end"]]))
            surface = "".join(toks[e["begin"] : e["end"]])
            tid = f"T{eid}"
            ann_lines.append(
                f"{tid}\t{TAG2NAME.get(e['tag'], e['tag'])} {b_char} {e_char}\t{surface}"
            )
            lastchar2eid[e_char - 1] = tid
            if e["mod"] != "_":
                # .get: unknown labels (foreign provider) fall back to a
                # generic attribute family instead of failing the document
                ann_lines.append(
                    f"A{mid}\t{MOD_DICT.get(e['mod'], 'mod')} {tid} {e['mod']}"
                )
                mid += 1
            eid += 1
        txt_lines.append(sent_str)
        line_start += len(sent_str) + 1  # newline
    # second pass: relations by span-final char anchor
    line_start = 0
    for s in sentences:
        toks = s["tokens"]
        for t in s.get("detailed_triples", []):
            tail_char = line_start + len("".join(toks[: t["tail_end"]])) - 1
            head_char = line_start + len("".join(toks[: t["head_end"]])) - 1
            if tail_char in lastchar2eid and head_char in lastchar2eid:
                if tail_char != head_char:
                    ann_lines.append(
                        f"R{rid}\t{t['rel']} Arg1:{lastchar2eid[tail_char]}"
                        f" Arg2:{lastchar2eid[head_char]}"
                    )
                    rid += 1
                else:
                    ann_lines.append(
                        f"A{mid}\tDCT-Rel {lastchar2eid[tail_char]} {t['rel']}"
                    )
                    mid += 1
        line_start += len("".join(toks)) + 1
    return "\n".join(txt_lines) + "\n", "\n".join(ann_lines) + "\n"


def annotations_to_brat(annotations: "DataFrame") -> "DataFrame":
    """annotations -> (url, txt, ann) via one grouped Arrow stage (same
    shared _rows_to_sentences conversion as the XML export)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sent_id")
        url = pdf["url"].iloc[0]
        txt, ann = doc_to_brat(_rows_to_sentences(pdf))
        return pd.DataFrame({"url": [url], "txt": [txt], "ann": [ann]})

    return (
        annotations.select(
            "url", "sent_id", "tokens", "ner", "mod", "rels", "heads", "entities"
        )
        .groupBy("url")
        .applyInPandas(build, schema="url string, txt string, ann string")
    )


# --- parser (round-trip tests) ----------------------------------------------

_TAG_RE = re.compile(r"<(/?)([\w-]+)((?:\s+[\w-]+=\"[^\"]*\")*)\s*/?>")
_ATTR_RE = re.compile(r"([\w-]+)=\"([^\"]*)\"")


def parse_xml_doc(xml: str) -> tuple[list[dict], list[dict]]:
    """Annotated XML -> (mentions, relations) standoff rows.

    mentions: (sent_id, tid, tag, surface, mod, begin_char) — begin_char is
    the offset into the tag-stripped sentence text (used by the xml2conll
    converter to re-anchor spans on tokens); relations: (arg1_tid, arg2_tid,
    reltype) with DCT self-loops restored as arg1 == arg2 (reference
    utils.py:686-697 builds the same rel_dic).
    """
    mentions: list[dict] = []
    relations: list[dict] = []
    sent_id = -1
    for line in xml.strip().split("\n"):
        if line.startswith(("<brel", "<trel")):
            attrs = dict(_ATTR_RE.findall(line))
            relations.append(
                {
                    "arg1_tid": attrs["arg1"],
                    "arg2_tid": attrs["arg2"],
                    "reltype": attrs["reltype"],
                }
            )
            continue
        # sentence index counts TEXT lines only — standoff rel rows must not
        # shift it (a rel line before the sentences would misalign every
        # mention's sent_id against the converters' plain-line indexing)
        sent_id += 1
        pos = 0
        stack: list[tuple[str, dict, int]] = []
        plain: list[str] = []
        for m in _TAG_RE.finditer(line):
            # unescape per segment so every recorded length/offset lives in
            # UNESCAPED (true text) space — the writer's inverse
            plain.append(_unescape(line[pos : m.start()]))
            pos = m.end()
            if m.group(1):  # closing
                tag, attrs, start_len = stack.pop()
                surface = "".join(plain)[start_len:]
                mod = "_"
                for fam in ("certainty", "state", "type", "mod"):
                    if fam in attrs:
                        mod = attrs[fam]
                mentions.append(
                    {
                        "sent_id": sent_id,
                        "tid": attrs["tid"],
                        "tag": tag,
                        "surface": surface,
                        "mod": mod,
                        "begin_char": start_len,
                    }
                )
                if "DCT-Rel" in attrs:
                    relations.append(
                        {
                            "arg1_tid": attrs["tid"],
                            "arg2_tid": attrs["tid"],
                            "reltype": attrs["DCT-Rel"],
                        }
                    )
            else:
                attrs = dict(_ATTR_RE.findall(m.group(3)))
                stack.append((m.group(2), attrs, len("".join(plain))))
        plain.append(_unescape(line[pos:]))
    return mentions, relations
