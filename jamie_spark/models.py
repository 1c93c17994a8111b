"""Model registry: pluggable joint extractors behind one contract (M1).

The inference stage (jamie_spark.infer) calls
``get_extractor(spec).annotate_sentence(tokens)`` — anything satisfying that
contract slots in. Two providers:

* ``standin`` (default) — the deterministic dictionary/rule tagger
  (jamie_spark.standin). CI and the correctness gates run on this.
* ``torch:<model_dir>`` — the real JaMIE-style artifact: a torch checkpoint +
  tokenizer + ``{ner,mod,rel}2ix.json`` vocab sidecars (reference
  ``clinical_joint.py:470-484`` load sequence). Gated behind an import-try —
  torch/transformers are not in this sandbox, so constructing it raises
  ``NotImplementedError`` with the exact requirements; the surrounding Spark
  plumbing (per-worker load-once, Arrow batching, flat emission) is identical
  and already exercised by the stand-in.

Worker lifecycle: ``get_extractor`` memoizes per (python worker process,
spec) — the reference loads its model once per process
(``clinical_joint.py:484``); on Spark that means once per executor python
worker, amortized over every Arrow batch the worker handles. Model spec
comes from the ``JAMIE_MODEL`` env var (shipped to executors via
``spark.executorEnv.JAMIE_MODEL``) or an explicit argument.
"""

from __future__ import annotations

import os
from typing import Protocol

from .standin import StandInJointExtractor


class JointExtractor(Protocol):
    """The M1 contract (reference model.py:598-780 output shape)."""

    #: WordPiece vocabulary when the provider runs a subword encoder, else
    #: None. The inference stage uses it for the T12 length gate: the
    #: reference gates on SUBWORD count (utils.py:826-842,
    #: ``len(bert_tokenizer.tokenize(...)) <= len_limit - 2``), which word
    #: count only lower-bounds — a 400-word sentence can exceed 510 subwords.
    subword_vocab: set[str] | None

    def annotate_sentence(
        self, tokens: list[str]
    ) -> tuple[list[str], list[str], list[list[str]], list[list[int]]]:
        """tokens -> (ner_bio, mod_tags, rel_lists, head_lists)."""
        ...  # pragma: no cover


class TorchJointExtractor:
    """Real-model provider (JaMIE joint checkpoint). Requires torch +
    transformers + torchcrf; absent in this sandbox."""

    def __init__(self, model_dir: str):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "torch/transformers are not installed in this environment. "
                "The torch provider needs: model.pt, tokenizer files and "
                "{ner,mod,rel}2ix.json under the model dir (the artifact "
                "layout the reference saves at clinical_joint.py:443-453), "
                f"requested dir: {model_dir!r}. The stand-in provider "
                "exercises the identical Spark plumbing."
            ) from exc
        raise NotImplementedError(
            "torch runtime present but the fine-tuned JaMIE artifact is not "
            "distributed with this repo"
        )  # pragma: no cover


def model_version(spec: str | None = None) -> str:
    """Version string recorded in lineage rows: the stand-in's pinned version
    for 'standin', the full spec otherwise. Resume is keyed on this — a model
    swap must recompute buckets, not skip them."""
    from .standin import MODEL_VERSION

    spec = spec or os.environ.get("JAMIE_MODEL", "standin")
    return MODEL_VERSION if spec == "standin" else spec


_CACHE: dict[str, object] = {}


def get_extractor(spec: str | None = None) -> "JointExtractor":
    """Resolve + memoize an extractor for this python worker process."""
    spec = spec or os.environ.get("JAMIE_MODEL", "standin")
    if spec not in _CACHE:
        if spec == "standin":
            _CACHE[spec] = StandInJointExtractor()
        elif spec.startswith("torch:"):
            _CACHE[spec] = TorchJointExtractor(spec.split(":", 1)[1])
        else:
            raise ValueError(f"unknown model spec: {spec!r}")
    return _CACHE[spec]  # type: ignore[return-value]
