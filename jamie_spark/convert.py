"""Batch corpus conversion: annotated XML <-> multihead CONLL (the
``data_converter.py`` CLI modes, reference ``data_converter.py:111-139``).

The reference loops a directory of files on one machine
(``xml_to_conll`` data_converter.py:6-44, ``conll_to_xml`` :99-108); here
each direction is one Arrow-batched ``mapInPandas`` stage over a
``(url, xml|conll)`` DataFrame — documents are independent rows, so corpus
prep parallelizes like every other stage. Pure per-document functions are
exposed for tests and driver-side use.

Semantics:

* xml2conll — inline tags -> BIO over the pinned tokenizer, modality from
  the family attribute, standoff brel/trel rows + DCT-Rel attributes ->
  multihead relation columns anchored on span-final tokens
  (reference ``convert_document_to_conll`` utils.py:668-847).
* conll2xml — BIO -> spans, modality from span-final token, multihead
  columns -> standoff rows, via the same writer the pipeline uses
  (``xml_io.doc_to_xml``, reference ``MultiheadConll.doc_to_xml``
  data_objects.py:267-310).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from typing import TYPE_CHECKING

import pandas as pd

from . import conll as conll_mod
from . import xml_io
from .bio import bio_to_spans, detailed_triplets, spans_to_bio
from .tokenizer import tokenize

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def xml_doc_to_conll(url: str, xml: str) -> str:
    """One annotated-XML document -> multihead CONLL text."""
    mentions, relations = xml_io.parse_xml_doc(xml)
    # plain sentence text = xml lines with tags stripped, then UNESCAPED —
    # parse_xml_doc reports surface/begin_char in unescaped (true-text)
    # space, so the offset walk below must live there too (tag-strip first
    # is safe: the writer escapes per token, so an entity never spans a
    # tag boundary and no false '&'+'amp;' adjacency can form)
    plain_lines = [
        xml_io._unescape(xml_io._TAG_RE.sub("", line))
        for line in xml.strip().split("\n")
        if not line.startswith(("<brel", "<trel"))
    ]
    sents = [tokenize(line) for line in plain_lines]
    # char offset -> token index per sentence (tokenize drops ASCII spaces,
    # so walk the raw line and skip the dropped chars)
    tid_anchor: dict[str, tuple[int, int]] = {}  # tid -> (sent_id, last_tok)
    spans_per_sent: dict[int, list] = {i: [] for i in range(len(sents))}
    mods_per_sent: dict[int, dict[int, str]] = {i: {} for i in range(len(sents))}
    starts_cache: dict[int, list[int]] = {}

    def _token_starts(sid: int) -> list[int]:
        """Char offset of each token within the raw plain line (whitespace
        the tokenizer drops advances the offset but yields no token)."""
        if sid not in starts_cache:
            starts: list[int] = []
            line, toks = plain_lines[sid], sents[sid]
            ti = pos = 0
            while ti < len(toks) and pos < len(line):
                surface = "　" if toks[ti] == "[JASP]" else toks[ti]
                if line.startswith(surface, pos):
                    starts.append(pos)
                    pos += len(surface)
                    ti += 1
                else:
                    pos += 1  # dropped whitespace
            starts_cache[sid] = starts
        return starts_cache[sid]

    for m in mentions:
        sid = m["sent_id"]
        if sid >= len(sents):
            continue
        toks = sents[sid]
        starts = _token_starts(sid)
        if not starts:
            continue
        # snap a mid-token begin to its CONTAINING token — symmetric with
        # the end-boundary widening below. Foreign corpora (the converter's
        # whole point) follow their own morphology; an exact-start-only
        # match silently dropped any entity whose begin fell inside one of
        # this tokenizer's maximal char-class runs.
        begin_tok = bisect_right(starts, m["begin_char"]) - 1
        if begin_tok < 0:
            continue
        # span end by CHAR OFFSET, not by summing token lengths: the surface
        # is a raw-text slice that may contain whitespace the tokenizer
        # dropped, so length-walking tokens would overshoot past the span
        end_char = m["begin_char"] + len(m["surface"])
        end_tok = bisect_left(starts, end_char)
        if end_tok <= begin_tok:
            continue
        spans_per_sent[sid].append((m["tag"], begin_tok, end_tok))
        if m["mod"] != "_":
            mods_per_sent[sid][end_tok - 1] = m["mod"]
        tid_anchor[m["tid"]] = (sid, end_tok - 1)

    rels_per_sent: dict[int, dict[int, tuple[list, list]]] = {
        i: {} for i in range(len(sents))
    }
    for r in relations:
        if r["arg1_tid"] not in tid_anchor or r["arg2_tid"] not in tid_anchor:
            continue
        sid, tail = tid_anchor[r["arg1_tid"]]
        head_sid, head = tid_anchor[r["arg2_tid"]]
        if head_sid != sid:
            # per-sentence CONLL cannot express a cross-line relation (head
            # ids are sentence-local token indices); writing arg2's index
            # under arg1's sentence would point at an unrelated token. Such
            # pairs only arise from document-level trunk XML; drop them
            # explicitly rather than corrupt the column.
            continue
        rl, hl = rels_per_sent[sid].setdefault(tail, ([], []))
        rl.append(r["reltype"])
        hl.append(head)

    out = [f"#doc {url}"]
    for sid, toks in enumerate(sents):
        n = len(toks)
        ner = spans_to_bio(n, spans_per_sent[sid])
        mod = ["_"] * n
        for anchor, m_lab in mods_per_sent[sid].items():
            mod[anchor] = m_lab
        rels = [[] for _ in range(n)]
        heads = [[] for _ in range(n)]
        for tail, (rl, hl) in rels_per_sent[sid].items():
            rels[tail] = rl
            heads[tail] = hl
        out.append(f"## line {sid}")
        out.extend(conll_mod.sentence_to_conll_lines(toks, ner, mod, rels, heads))
    return "\n".join(out) + "\n"


def conll_doc_to_xml(conll_text: str) -> tuple[str, str]:
    """One multihead-CONLL document -> (url, annotated XML text)."""
    rows = conll_mod.parse_conll(conll_text)
    url = rows[0]["url"] if rows else ""
    sentences = []
    for row in rows:
        toks = [
            t.replace("[JASP]", "　").replace("[SEP]", "\n")
            for t in row["tokens"]
        ]
        spans = bio_to_spans(row["ner"])
        det = detailed_triplets(row["ner"], row["rels"], row["heads"])
        sentences.append(
            {
                "sent_id": row["sent_id"],
                "tokens": toks,
                "entities": [
                    {"tag": t, "begin": b, "end": e, "mod": row["mod"][e - 1]}
                    for t, b, e in spans
                ],
                "detailed_triples": [
                    {"tail_begin": tb, "tail_end": te, "head_begin": hb,
                     "head_end": he, "rel": rel}
                    for tb, te, hb, he, rel in det
                ],
            }
        )
    return url, xml_io.doc_to_xml(sentences)


def xml_to_conll(docs: "DataFrame") -> "DataFrame":
    """(url, xml) -> (url, conll), one Arrow stage. Per-DOCUMENT error
    isolation (same contract as the inference path, reference
    utils.py:844-846): one malformed file is skipped, never kills a batch
    conversion job."""

    def run(batches):
        for pdf in batches:
            out = {"url": [], "conll": []}
            for u, x in zip(pdf["url"], pdf["xml"]):
                try:
                    c = xml_doc_to_conll(u, x)
                except Exception:
                    continue
                out["url"].append(u)
                out["conll"].append(c)
            if out["url"]:
                yield pd.DataFrame(out)

    return docs.select("url", "xml").mapInPandas(
        run, schema="url string, conll string"
    )


def conll_to_xml(docs: "DataFrame") -> "DataFrame":
    """(url, conll) -> (url, xml), one Arrow stage; per-document error
    isolation as in :func:`xml_to_conll`."""

    def run(batches):
        for pdf in batches:
            out = {"url": [], "xml": []}
            for orig, c in zip(pdf["url"], pdf["conll"]):
                try:
                    u, x = conll_doc_to_xml(c)
                except Exception:
                    continue
                out["url"].append(u or orig)
                out["xml"].append(x)
            if out["url"]:
                yield pd.DataFrame(out)

    return docs.select("url", "conll").mapInPandas(
        run, schema="url string, xml string"
    )
