"""BIO span algebra (SURVEY.md §2.5) — pure functions used inside UDFs.

Semantics are a faithful re-expression (not a copy) of the reference:

* ``bio_to_spans`` — reference ``data_objects.py:44-70``: tolerant of spans
  that *start* with ``I-`` and of tag switches inside an ``I-`` run (each
  switch closes the previous span and opens a new one).
* modality attaches to the **last token** of each span — reference
  ``data_objects.py:226-229`` (``mod_tags[end - 1]``).
* relations are anchored on the **last token id** of each entity span, may be
  multi-headed (several ``(head, rel)`` pairs per token), with ``'N'`` as the
  null relation — reference ``utils.py:804-814`` and
  ``data_objects.py:231-238``.
* mention-string triples join entity tokens with ``''`` and drop any triple
  whose anchor is not a span-final token — reference
  ``data_objects.py:251-265`` (``_rel_mention_triplets``).
"""

from __future__ import annotations

Span = tuple[str, int, int]  # (tag, begin, end_exclusive)


def bio_to_spans(ner_tags: list[str]) -> list[Span]:
    """Decode a BIO tag sequence into (tag, begin, end) spans.

    Matches reference ``data_objects.py:44-70`` on every path, including the
    pathological ones: leading ``I-``, ``I-`` after ``O``, and tag switches
    mid-run.
    """
    spans: list[Span] = []
    start: int | None = None
    for i, tag in enumerate(ner_tags):
        if i == 0:
            if tag != "O":
                start = 0
            continue
        prev = ner_tags[i - 1]
        if tag == "O" or tag.startswith("O"):
            if start is not None:
                spans.append((prev[2:], start, i))
                start = None
        elif tag.startswith("I"):
            if start is not None:
                if tag[2:] != prev[2:]:
                    spans.append((prev[2:], start, i))
                    start = i
            else:
                start = i
        elif tag.startswith("B"):
            if start is not None:
                spans.append((prev[2:], start, i))
            start = i
        else:
            raise ValueError(f"bad BIO tag: {tag!r}")
    if start is not None:
        spans.append((ner_tags[-1][2:], start, len(ner_tags)))
    return spans


def spans_to_bio(n_tokens: int, spans: list[Span]) -> list[str]:
    """Inverse of :func:`bio_to_spans` for well-formed, non-overlapping spans."""
    tags = ["O"] * n_tokens
    for tag, begin, end in spans:
        tags[begin] = f"B-{tag}"
        for i in range(begin + 1, end):
            tags[i] = f"I-{tag}"
    return tags


def mod_entities(
    ner_tags: list[str], mod_tags: list[str]
) -> list[tuple[str, int, int, str]]:
    """Spans + modality-of-last-token (reference data_objects.py:226-229)."""
    return [
        (tag, b, e, mod_tags[e - 1]) for tag, b, e in bio_to_spans(ner_tags)
    ]


def rel_triplets(
    rel_lists: list[list[str]], head_lists: list[list[int]]
) -> list[tuple[int, int, str]]:
    """Flatten multihead columns to (tail_tok_id, head_tok_id, rel), rel != 'N'.

    Reference ``data_objects.py:231-238``.
    """
    out: list[tuple[int, int, str]] = []
    for tail_id, (heads, rels) in enumerate(zip(head_lists, rel_lists)):
        for head_id, rel in zip(heads, rels):
            if rel != "N":
                out.append((tail_id, head_id, rel))
    return out


def mention_triplets(
    tokens: list[str],
    ner_tags: list[str],
    rel_lists: list[list[str]],
    head_lists: list[list[int]],
) -> list[tuple[str, str, str]]:
    """(tail_mention, head_mention, rel) per reference data_objects.py:251-265.

    Anchors that are not the last token of a decoded entity are skipped, as in
    the reference (comment at data_objects.py:260).
    """
    last_tok_to_span = {e - 1: (b, e) for _, b, e in bio_to_spans(ner_tags)}
    out: list[tuple[str, str, str]] = []
    for tail_id, head_id, rel in rel_triplets(rel_lists, head_lists):
        if tail_id in last_tok_to_span and head_id in last_tok_to_span:
            tb, te = last_tok_to_span[tail_id]
            hb, he = last_tok_to_span[head_id]
            out.append(("".join(tokens[tb:te]), "".join(tokens[hb:he]), rel))
    return out


def detailed_triplets(
    ner_tags: list[str],
    rel_lists: list[list[str]],
    head_lists: list[list[int]],
) -> list[tuple[int, int, int, int, str]]:
    """(tail_b, tail_e, head_b, head_e, rel) — reference data_objects.py:240-249.

    Unlike :func:`mention_triplets`, a non-span-final anchor falls back to the
    single-token span ``(id, id+1)``.
    """
    last_tok_to_span = {e - 1: (b, e) for _, b, e in bio_to_spans(ner_tags)}
    out: list[tuple[int, int, int, int, str]] = []
    for tail_id, head_id, rel in rel_triplets(rel_lists, head_lists):
        tb, te = last_tok_to_span.get(tail_id, (tail_id, tail_id + 1))
        hb, he = last_tok_to_span.get(head_id, (head_id, head_id + 1))
        out.append((tb, te, hb, he, rel))
    return out
