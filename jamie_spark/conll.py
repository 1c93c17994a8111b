"""Multihead-CONLL fixture format (S4/S5/S8 in SURVEY.md §2.1).

The reference pivots everything through a 6-column TAB file — one token per
line, sentences delimited by ``#doc`` / ``## line`` comments, relation/head
cells as stringified Python lists (reference ``utils.py:1698`` column order,
written at ``utils.py:839-840``; parsed with ``eval()`` at
``data_objects.py:213-214``). Our engine keeps real arrays end-to-end and
treats CONLL purely as a *fixture interchange format* for parity tests: the
writer emits byte-compatible files, the reader parses them back WITHOUT
``eval`` (a literal list parser — never execute data).

In-band token games preserved: ``[JASP]`` = U+3000 (``utils.py:678``),
``[SEP]`` = newline in document-level mode (``utils.py:722``), decoded back
at ``data_objects.py:210``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd

from .textnorm import IDEOGRAPHIC_SPACE, JASP, SEP

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def sentence_to_conll_lines(
    tokens: list[str],
    ner: list[str],
    mod: list[str],
    rels: list[list[str]],
    heads: list[list[int]],
) -> list[str]:
    """One sentence -> 6-column TAB rows (reference utils.py:835-840).

    Tokens with no relation get the null relation ``['N']`` pointing at
    themselves, matching the reference's default cells.
    """
    lines = []
    for i, tok in enumerate(tokens):
        tok_out = tok.replace(IDEOGRAPHIC_SPACE, JASP).replace("\n", SEP)
        r = rels[i] if rels[i] else ["N"]
        h = heads[i] if heads[i] else [i]
        r_str = "[" + ", ".join(f"'{x}'" for x in r) + "]"
        h_str = "[" + ", ".join(str(x) for x in h) + "]"
        lines.append(f"{i}\t{tok_out}\t{ner[i]}\t{mod[i]}\t{r_str}\t{h_str}")
    return lines


def annotations_to_conll(annotations: "DataFrame") -> "DataFrame":
    """annotations -> (url, conll) one CONLL document string per url.

    Doc assembly is a grouped Arrow stage (``applyInPandas``) — each document
    is one group, sentences ordered by sent_id; format mirrors the reference
    delimiters ``#doc`` / ``## line``.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sent_id")
        url = pdf["url"].iloc[0]
        out = [f"#doc {url}"]
        for _, row in pdf.iterrows():
            out.append(f"## line {row['sent_id']}")
            out.extend(
                sentence_to_conll_lines(
                    list(row["tokens"]),
                    list(row["ner"]),
                    list(row["mod"]),
                    [list(x) for x in row["rels"]],
                    [[int(i) for i in x] for x in row["heads"]],
                )
            )
        return pd.DataFrame({"url": [url], "conll": ["\n".join(out) + "\n"]})

    return (
        annotations.select("url", "sent_id", "tokens", "ner", "mod", "rels", "heads")
        .groupBy("url")
        .applyInPandas(build, schema="url string, conll string")
    )


# --- reader (pure python; fixture-side) -------------------------------------

def _parse_literal_list(cell: str) -> list:
    """Parse ``"['N']"`` / ``"[3, 7]"`` without eval (the reference uses
    eval() at data_objects.py:213-214 — we never execute data)."""
    inner = cell.strip()[1:-1].strip()
    if not inner:
        return []
    items = []
    for part in inner.split(","):
        part = part.strip()
        if part.startswith("'") or part.startswith('"'):
            items.append(part[1:-1])
        else:
            items.append(int(part))
    return items


def parse_conll(text: str) -> list[dict]:
    """CONLL document string -> per-sentence dicts (S4+S5 combined).

    Returns rows shaped like the annotations table: url, sent_id, tokens,
    ner, mod, rels, heads. Tokens stay in their in-band form ([JASP]/[SEP]
    kept verbatim) — that IS the engine's internal token representation;
    decoding to U+3000/newline happens only on the XML emit path, mirroring
    the reference (raw in MultiheadConllObject, decoded in
    MultiheadConll.update_columns data_objects.py:210 for doc_to_xml).
    """
    url = None
    rows: list[dict] = []
    cur: dict | None = None
    for line in text.splitlines():
        if line.startswith("#doc"):
            url = line[len("#doc") :].strip()
            continue
        if line.startswith("## line"):
            if cur is not None:
                rows.append(cur)
            cur = {
                "url": url,
                "sent_id": int(line[len("## line") :].strip()),
                "tokens": [],
                "ner": [],
                "mod": [],
                "rels": [],
                "heads": [],
            }
            continue
        if not line.strip() or cur is None:
            continue
        cols = line.split("\t")
        cur["tokens"].append(cols[1])
        cur["ner"].append(cols[2])
        cur["mod"].append(cols[3])
        cur["rels"].append([str(x) for x in _parse_literal_list(cols[4])])
        cur["heads"].append([int(x) for x in _parse_literal_list(cols[5])])
    if cur is not None:
        rows.append(cur)
    return rows
