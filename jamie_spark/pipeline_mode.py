"""Pipeline-mode extraction: three chained stages (M4/M5/M6).

The reference ships two architectures: the joint extractor
(``clinical_joint.py`` -> our infer.annotate_pages*) and a staged pipeline —
NER (``clinical_pipeline_ner.py``, M4), then modality over detected entities
(``clinical_pipeline_mod.py``, M5), then relation classification over
candidate entity pairs (``clinical_pipeline_rel.py``, M6). Each stage loads
its own model and re-reads the previous stage's output.

Re-expressed Spark-first: each stage is ONE ``mapInPandas`` over
annotation-shaped rows, so stages can be checkpointed/resumed independently
(a real deployment swaps each stand-in for its own torch artifact with
per-worker load-once). Candidate-pair generation between M5 and M6 is the R2
operator: all tail x head span pairs per sentence (reference
``utils.py:1637-1660``), classified by M6 and emitted as multihead lists.

The chained output is CONTRACT-EQUAL to the joint path — asserted in
``tests/test_pipeline_mode.py``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd

from .standin import StandInJointExtractor

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

TOKENS_DDL = "url string, sent_id int, tokens array<string>"
NER_DDL = TOKENS_DDL + ", ner array<string>"
MOD_DDL = NER_DDL + ", mod array<string>"
FULL_DDL = (
    MOD_DDL + ", rels array<array<string>>, heads array<array<int>>"
)

_TAGGER: StandInJointExtractor | None = None


def _tagger() -> StandInJointExtractor:
    global _TAGGER
    if _TAGGER is None:
        _TAGGER = StandInJointExtractor()
    return _TAGGER


def _stage(schema: str, fn):
    def run(batches):
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return lambda df: df.mapInPandas(run, schema=schema)


def ner_stage(tokens_df: "DataFrame") -> "DataFrame":
    """M4 (BertCRF analog): tokens -> BIO tags."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        t = _tagger()
        ner = []
        for toks in pdf["tokens"]:
            toks = list(toks)
            spans = t._match_entities(toks)
            tags = ["O"] * len(toks)
            for tag, b, e in spans:
                tags[b] = f"B-{tag}"
                for i in range(b + 1, e):
                    tags[i] = f"I-{tag}"
            ner.append(tags)
        out = pdf[["url", "sent_id", "tokens"]].copy()
        out["ner"] = ner
        return out

    return _stage(NER_DDL, fn)(tokens_df.select("url", "sent_id", "tokens"))


def mod_stage(ner_df: "DataFrame") -> "DataFrame":
    """M5 (ModalityClassifier analog): (tokens, ner) -> span-final modality."""
    from .bio import bio_to_spans

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        t = _tagger()
        mods = []
        for toks, ner in zip(pdf["tokens"], pdf["ner"]):
            toks = list(toks)
            mod = ["_"] * len(toks)
            # per-row isolation, same contract as the joint path: a
            # malformed BIO tag from a foreign NER checkpoint degrades
            # THIS sentence to no-spans instead of killing the task
            try:
                spans = bio_to_spans(list(ner))
            except ValueError:
                spans = []
            for tag, b, e in spans:
                mod[e - 1] = t._modality(toks, tag, b, e)
            mods.append(mod)
        out = pdf[["url", "sent_id", "tokens", "ner"]].copy()
        out["mod"] = mods
        return out

    return _stage(MOD_DDL, fn)(ner_df.select("url", "sent_id", "tokens", "ner"))


def rel_stage(mod_df: "DataFrame") -> "DataFrame":
    """M6 (PipelineRelation analog): R2 candidate pairs -> multihead lists.

    Classifies over the UPSTREAM stage's spans (bio_to_spans of the provided
    ner column) — never re-detects entities, so any NER model's checkpointed
    output can feed it. Pair generation and classification stay intra-row
    (sentence = row), so the stage is shuffle-free like the joint path.
    """
    from .bio import bio_to_spans
    from .standin import relations_for_spans

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        all_rels, all_heads = [], []
        for toks, ner in zip(pdf["tokens"], pdf["ner"]):
            n = len(list(toks))
            rels: list[list[str]] = [[] for _ in range(n)]
            heads: list[list[int]] = [[] for _ in range(n)]
            # same per-row degradation as mod_stage: the docstring's "any
            # NER model's checkpointed output can feed it" must hold for
            # malformed tags too
            try:
                spans = bio_to_spans(list(ner))
            except ValueError:
                spans = []
            for tail, head, rel in relations_for_spans(spans):
                rels[tail].append(rel)
                heads[tail].append(head)
            all_rels.append(rels)
            all_heads.append(heads)
        out = pdf[["url", "sent_id", "tokens", "ner", "mod"]].copy()
        out["rels"] = all_rels
        out["heads"] = all_heads
        return out

    return _stage(FULL_DDL, fn)(
        mod_df.select("url", "sent_id", "tokens", "ner", "mod")
    )


def run_pipeline_mode(tokens_df: "DataFrame") -> "DataFrame":
    """Chain M4 -> M5 -> M6 over tokenized sentences."""
    return rel_stage(mod_stage(ner_stage(tokens_df)))
