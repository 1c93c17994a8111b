"""i2b2-2010-style standoff corpus ingestion (S7, reference formater.py).

The reference's ``MultiheadConllConvertor.load_single_from_i2b2``
(``formater.py:93-176``) merges four per-document files — ``.txt`` (text),
``.con`` (concept spans), ``.ast`` (assertions/modality), ``.rel``
(relations) — into multihead CONLL with relations re-anchored on span-final
tokens. Re-expressed here as the survey prescribes (§2.1 S7): four line
DataFrames joined on ``(doc_id, line_no[, tok_end])`` and grouped back into
per-sentence annotation rows. Line parsing is vectorized (one ``pandas_udf``
per standoff format); everything after parsing is JVM joins/aggregations.

Standoff grammar (i2b2 2010):
    con:  c="<surface>" L:T L:T||t="<type>"
    ast:  c="<surface>" L:T L:T||t="<type>"||a="<assertion>"
    rel:  c="..." L:T L:T||r="<rel>"||c="..." L:T L:T
Line/token indices are 1-based lines, 0-based tokens (as in i2b2).

Type/assertion mapping into the engine's tag/modality vocabulary:
    problem -> d, test -> t-test, treatment -> r
    present -> positive, absent -> negative, possible -> suspicious
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

I2B2_TYPE_TO_TAG = {"problem": "d", "test": "t-test", "treatment": "r"}
I2B2_AST_TO_MOD = {
    "present": "positive",
    "absent": "negative",
    "possible": "suspicious",
    "conditional": "general",
    "hypothetical": "general",
}

_CON_RE = re.compile(
    r'c="(?P<surface>[^"]*)" (?P<l1>\d+):(?P<t1>\d+) (?P<l2>\d+):(?P<t2>\d+)'
    r'\|\|t="(?P<type>[^"]*)"'
)
_AST_RE = re.compile(
    r'c="(?P<surface>[^"]*)" (?P<l1>\d+):(?P<t1>\d+) (?P<l2>\d+):(?P<t2>\d+)'
    r'\|\|t="(?P<type>[^"]*)"\|\|a="(?P<ast>[^"]*)"'
)
_REL_RE = re.compile(
    r'c="[^"]*" (?P<al1>\d+):(?P<at1>\d+) (?P<al2>\d+):(?P<at2>\d+)'
    r'\|\|r="(?P<rel>[^"]*)"'
    r'\|\|c="[^"]*" (?P<bl1>\d+):(?P<bt1>\d+) (?P<bl2>\d+):(?P<bt2>\d+)'
)

CON_DDL = "line_no int, tok_begin int, tok_end int, tag string"
AST_DDL = "line_no int, tok_end int, mod string"
REL_DDL = "a_line int, a_end int, b_line int, b_end int, rel string"


def parse_con_line(line: str) -> tuple | None:
    m = _CON_RE.match(line.strip())
    if not m:
        return None
    return (
        int(m["l1"]),
        int(m["t1"]),
        int(m["t2"]) + 1,  # end-exclusive
        I2B2_TYPE_TO_TAG.get(m["type"], m["type"]),
    )


def parse_ast_line(line: str) -> tuple | None:
    m = _AST_RE.match(line.strip())
    if not m:
        return None
    return (int(m["l1"]), int(m["t2"]) + 1, I2B2_AST_TO_MOD.get(m["ast"], "_"))


def parse_rel_line(line: str) -> tuple | None:
    m = _REL_RE.match(line.strip())
    if not m:
        return None
    return (
        int(m["al1"]),
        int(m["at2"]) + 1,
        int(m["bl1"]),
        int(m["bt2"]) + 1,
        m["rel"],
    )


def _parsed_df(lines: "DataFrame", parser, ddl: str) -> "DataFrame":
    """(doc_id, line) -> parsed standoff rows (vectorized)."""
    import pandas as pd

    fields = [f.strip().split(" ")[0] for f in ddl.split(",")]

    def run(batches):
        for pdf in batches:
            out = {"doc_id": []}
            for f in fields:
                out[f] = []
            for doc_id, line in zip(pdf["doc_id"], pdf["line"]):
                parsed = parser(line)
                if parsed is None:
                    continue
                out["doc_id"].append(doc_id)
                for f, v in zip(fields, parsed):
                    out[f].append(v)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return lines.mapInPandas(run, schema=f"doc_id long, {ddl}")


def load_i2b2(
    txt: "DataFrame", con: "DataFrame", ast: "DataFrame", rel: "DataFrame"
) -> "DataFrame":
    """Four standoff line tables -> per-sentence annotation rows.

    Inputs all have (doc_id long, line_no int?/line string):
      txt: (doc_id, line_no, line) — whitespace-tokenized text lines
      con/ast/rel: (doc_id, line) — standoff rows

    Output: (url, sent_id, tokens, ner, mod, rels, heads) — the engine's
    annotation shape, relations anchored span-final (reference
    formater.py:136-155 semantics).
    """
    import pandas as pd

    cons = _parsed_df(con, parse_con_line, CON_DDL)
    asts = _parsed_df(ast, parse_ast_line, AST_DDL)
    rels = _parsed_df(rel, parse_rel_line, REL_DDL)

    # join 1: modality onto concepts (doc, line, span-end)
    entities = cons.join(asts, ["doc_id", "line_no", "tok_end"], "left").select(
        "doc_id", "line_no", "tok_begin", "tok_end", "tag",
        F.coalesce("mod", F.lit("_")).alias("mod"),
    )
    # join 2+3: relations onto text lines happen inside the assembly group
    # (relations are line-local pairs keyed by span-final token)
    ent_by_doc = entities.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("line_no", "tok_begin", "tok_end", "tag", "mod")
        ).alias("ents")
    )
    rel_by_doc = rels.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("a_line", "a_end", "b_line", "b_end", "rel")
        ).alias("rels")
    )
    lines_by_doc = txt.groupBy("doc_id").agg(
        F.collect_list(F.struct("line_no", "line")).alias("lines")
    )
    merged = lines_by_doc.join(ent_by_doc, "doc_id", "left").join(
        rel_by_doc, "doc_id", "left"
    )

    out_ddl = (
        "url string, sent_id int, tokens array<string>, ner array<string>, "
        "mod array<string>, rels array<array<string>>, heads array<array<int>>"
    )

    def assemble(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "url", "sent_id", "tokens", "ner", "mod", "rels", "heads")}
            for doc_id, lines, ents, drels in zip(
                pdf["doc_id"], pdf["lines"], pdf["ents"], pdf["rels"]
            ):
                ents = list(ents) if ents is not None else []
                drels = list(drels) if drels is not None else []
                for entry in sorted(lines, key=lambda x: x["line_no"]):
                    line_no = entry["line_no"]
                    toks = entry["line"].split()
                    n = len(toks)
                    ner = ["O"] * n
                    mod = ["_"] * n
                    rl: list[list[str]] = [[] for _ in range(n)]
                    hl: list[list[int]] = [[] for _ in range(n)]
                    for e in ents:
                        if e["line_no"] != line_no:
                            continue
                        b, t = e["tok_begin"], min(e["tok_end"], n)
                        if b >= n:
                            continue
                        ner[b] = f"B-{e['tag']}"
                        for i in range(b + 1, t):
                            ner[i] = f"I-{e['tag']}"
                        mod[t - 1] = e["mod"]
                    for r in drels:
                        # reference keeps only intra-line relations
                        if r["a_line"] == line_no and r["b_line"] == line_no:
                            tail = min(r["a_end"], n) - 1
                            head = min(r["b_end"], n) - 1
                            rl[tail].append(r["rel"])
                            hl[tail].append(head)
                    rows["url"].append(f"i2b2://doc/{doc_id}")
                    rows["sent_id"].append(line_no - 1)
                    rows["tokens"].append(toks)
                    rows["ner"].append(ner)
                    rows["mod"].append(mod)
                    rows["rels"].append(rl)
                    rows["heads"].append(hl)
            if rows["url"]:
                yield pd.DataFrame(rows)

    return merged.mapInPandas(assemble, schema=out_ddl)
