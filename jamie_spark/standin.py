"""Deterministic stand-in joint extractor (M1 decode semantics, no torch).

The reference's flagship model ``JointNerModReExtractor`` (reference
``model.py:598-780``) produces, per sentence: BIO NER tags (CRF decode),
a modality tag per token (span-final), and multihead relation triples
anchored on span-final tokens (``selection_decode``, ``model.py:728-770``).

This module implements the SAME OUTPUT CONTRACT with a deterministic
dictionary/rule tagger (SURVEY.md §7 step 2): the torch-free stand-in lets the
whole distributed pipeline — Arrow batching, schema, explode, eval, linking,
materialization — be tested end-to-end and gated at P/R >= 0.95 without GPUs.
The real-model path plugs in behind the same ``annotate_sentence`` signature
(see jamie_spark.infer for the per-worker load-once pattern).

Decode semantics preserved from the reference:

* NER: longest dictionary match, left-to-right, horizon = the
  dictionary's longest tokenized alias -> BIO tags.
* modality attaches to the span-final token (reference
  ``data_objects.py:226-229``); non-final tokens carry ``'_'``.
* relations are (tail_last_tok -> head_last_tok, label) multihead lists on the
  tail token (reference ``utils.py:804-814``); DCT relations are self-loops
  (tail == head, reference ``utils.py:687-691``).

Rule grammar (versioned; the fixture corpus instantiates exactly these
patterns, so stand-in predictions match the gold annotations — the analog of
the reference model scoring ~1.0 on its own training distribution):

* certainty of a disease: ``疑`` in the 6 tokens after the span ->
  ``suspicious``; a token starting ``められない``/``ない`` -> ``negative``;
  else ``positive``.
* state of a drug: ``予定`` after the span -> ``scheduled``; else
  ``executed`` (with or without an explicit ``投与`` cue).
* TIMEX3 modality is the dictionary type (DATE/TIME/DURATION/AGE).
* relations per sentence: every d -> every a (``region``); every d -> every
  TIMEX3 (``timeOnset``); every t-val -> nearest preceding t-key (``value``);
  every d gets a DCT self-loop ``On`` iff the sentence contains a TIMEX3.
"""

from __future__ import annotations

from . import concepts
from .tokenizer import tokenize

MODEL_VERSION = "standin-dict-1"


class StandInJointExtractor:
    """Deterministic joint NER+modality+relation tagger.

    Construct once per executor python worker (module-level cache in
    jamie_spark.infer); stateless after init.
    """

    def __init__(self) -> None:
        # (tok_tuple) -> tag ; tokenized with the pinned engine tokenizer so
        # dictionary spans align with input tokenization by construction.
        self._dict: dict[tuple[str, ...], str] = {}
        for surface, tag in concepts.surface_tag_pairs():
            self._dict[tuple(tokenize(surface))] = tag
        # match horizon DERIVED from the dictionary: a hardcoded cap would
        # silently make any longer future surface unmatchable (the old
        # constant 4 happened to equal today's longest alias)
        self._max_match = max((len(k) for k in self._dict), default=1)
        self._time_type = dict(concepts.TIMES)
        # the SAME WordPiece vocabulary the compiled numpy checkpoint uses:
        # the reference packs doc-mode trunks and gates T12 by SUBWORD count
        # (bert_sent_len, reference utils.py:651-664), so all providers must
        # account in one shared unit or doc-mode output becomes
        # provider-dependent. The stand-in still DECODES over word tokens —
        # the vocab only drives gating/packing in jamie_spark.infer.
        # (lazy import: models imports this module at top level)
        from .npmodel import fixture_vocab

        self.subword_vocab: set[str] | None = set(fixture_vocab())

    # -- NER ---------------------------------------------------------------

    def _match_entities(self, tokens: list[str]) -> list[tuple[str, int, int]]:
        """Longest-match dictionary NER -> (tag, begin, end) spans."""
        spans: list[tuple[str, int, int]] = []
        i = 0
        n = len(tokens)
        while i < n:
            hit = None
            for width in range(min(self._max_match, n - i), 0, -1):
                key = tuple(tokens[i : i + width])
                if key in self._dict:
                    hit = (self._dict[key], i, i + width)
                    break
            if hit is not None:
                spans.append(hit)
                i = hit[2]
            else:
                i += 1
        return spans

    # -- modality ----------------------------------------------------------

    def _modality(
        self, tokens: list[str], tag: str, begin: int, end: int
    ) -> str:
        window = tokens[end : end + 6]
        if tag == "d":
            for tok in window:
                if "疑" in tok:
                    return "suspicious"
                if tok.startswith("められない") or tok.startswith("ない"):
                    return "negative"
            return "positive"
        if tag == "r":
            # grammar: 予定 in the window -> scheduled; anything else
            # (投与 or no cue at all) -> executed. The old explicit 投与
            # branch was dead — it returned the same value as the
            # fallback — and read as if a third outcome existed.
            if any("予定" in t for t in window):
                return "scheduled"
            return "executed"
        if tag == "TIMEX3":
            return self._time_type.get("".join(tokens[begin:end]), "DATE")
        return "_"

    # -- joint decode --------------------------------------------------------

    def annotate_sentence(
        self, tokens: list[str]
    ) -> tuple[list[str], list[str], list[list[str]], list[list[int]]]:
        """tokens -> (ner_bio, mod_tags, rel_lists, head_lists).

        Same per-sentence contract as the reference joint decode
        (reference ``clinical_joint.py:70-95``): parallel lists, relations as
        multihead (rels, head_ids) lists on the tail token.
        """
        n = len(tokens)
        ner = ["O"] * n
        mod = ["_"] * n
        rels: list[list[str]] = [[] for _ in range(n)]
        heads: list[list[int]] = [[] for _ in range(n)]

        spans = self._match_entities(tokens)
        for tag, b, e in spans:
            ner[b] = f"B-{tag}"
            for i in range(b + 1, e):
                ner[i] = f"I-{tag}"
            mod[e - 1] = self._modality(tokens, tag, b, e)

        for tail, head, rel in relations_for_spans(spans):
            rels[tail].append(rel)
            heads[tail].append(head)

        return ner, mod, rels, heads


def relations_for_spans(
    spans: list[tuple[str, int, int]],
) -> list[tuple[int, int, str]]:
    """The relation rule grammar over decoded spans: (tail_anchor,
    head_anchor, rel), anchors = span-final token ids.

    Factored out so the staged pipeline's relation stage (M6) can classify
    over ANY upstream NER output — it must not re-run span detection.
    """
    d_anchors = [e - 1 for t, b, e in spans if t == "d"]
    a_anchors = [e - 1 for t, b, e in spans if t == "a"]
    t_anchors = [e - 1 for t, b, e in spans if t == "TIMEX3"]
    key_anchors = [e - 1 for t, b, e in spans if t == "t-key"]
    val_anchors = [e - 1 for t, b, e in spans if t == "t-val"]

    out: list[tuple[int, int, str]] = []
    for d in d_anchors:
        for a in a_anchors:
            out.append((d, a, concepts.REL_REGION))
        for t in t_anchors:
            out.append((d, t, concepts.REL_TIME))
        if t_anchors:
            out.append((d, d, concepts.DCT_ON))  # DCT self-loop
    for v in val_anchors:
        preceding = [k for k in key_anchors if k < v]
        if preceding:
            out.append((v, max(preceding), concepts.REL_VALUE))
    return out
