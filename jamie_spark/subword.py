"""Subword tokenization + label/mask alignment (T5-T10 in SURVEY.md §2.2).

The reference runs HuggingFace WordPiece between word tokenization and the
model (``utils.py:400,2000,2494``), then realigns predictions back to words
(``utils.py:1821-1892``). The transformers library is absent in this sandbox,
so the engine pins its own deterministic WordPiece implementation (same
greedy-longest-prefix semantics) — the real-model path can swap in the HF
tokenizer behind the same function signatures, and every alignment function
here is tokenizer-agnostic.

All functions are pure and run inside the inference UDF (per Arrow batch) —
never driver-side per-row Python.

Semantics preserved from the reference:

* T5 greedy WordPiece with ``##`` continuations and ``[UNK]`` fallback.
* T6 de-UNK restoration — ``[UNK]`` subwords replaced by their original
  surface so detokenization is lossless (``explore_unk`` utils.py:170-185).
* T7 NER label expansion — a word's ``B-x`` stays on its first subword,
  continuations get ``I-x`` (``match_ner_label`` utils.py:117-125).
* T8 modality shift — the span-final word label moves to the word's LAST
  subword (``match_mod_label`` utils.py:128-135).
* T9 entity-mask expansion — word-level 0/1 masks repeat over subwords
  (``match_bpe_mask`` utils.py:153-159).
* T10 subword->word realignment — collapse ``##`` runs; first-subword NER,
  last-subword modality, relation heads remapped from subword ids to word
  ids (``sbwtok2tok_alignment``/``sbwner2ner``/``sbwmod2mod``/``sbwrel2head``
  utils.py:1831-1892).
* T12 length filter — drop sequences over the model limit
  (``utils.py:826-842``).
"""

from __future__ import annotations

UNK = "[UNK]"
MAX_SUBWORDS = 510  # reference limit: 512 minus [CLS]/[SEP] (utils.py:826)


def wordpiece(token: str, vocab: set[str], max_chars: int = 100) -> list[str]:
    """Greedy longest-prefix WordPiece of one word token (T5)."""
    if len(token) > max_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    while start < len(token):
        end = len(token)
        cur = None
        while start < end:
            piece = token[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def subword_count(tokens: list[str], vocab: set[str]) -> int:
    """Subword length of a word-token sequence WITHOUT materializing the
    pieces — the T12 gate / doc-mode packing accounting (reference
    ``bert_sent_len``, utils.py:651-664). In-vocab words are one set probe;
    only out-of-vocab words pay the WordPiece walk."""
    n = 0
    for t in tokens:
        n += 1 if t in vocab else len(wordpiece(t, vocab))
    return n


def tokenize_subwords(
    tokens: list[str], vocab: set[str] | None = None, piecer=None
) -> tuple[list[str], list[int]]:
    """Word tokens -> (subwords, word_id per subword). T5 + alignment ids.

    ``piecer`` substitutes a custom per-token subword function (e.g. a real
    HF tokenizer hook) for the pinned WordPiece — the parameterization that
    lets the production extractors (models.BatchedJointExtractor._subwords)
    share this exact implementation."""
    if piecer is None:
        piecer = lambda t: wordpiece(t, vocab)  # noqa: E731
    sbw: list[str] = []
    word_ids: list[int] = []
    for wid, tok in enumerate(tokens):
        pieces = piecer(tok)
        sbw.extend(pieces)
        word_ids.extend([wid] * len(pieces))
    return sbw, word_ids


def restore_unk(subwords: list[str], word_ids: list[int], tokens: list[str]) -> list[str]:
    """T6: replace [UNK] subwords with the original word surface."""
    return [
        tokens[wid] if piece == UNK else piece
        for piece, wid in zip(subwords, word_ids)
    ]


def expand_ner_labels(
    word_labels: list[str], word_ids: list[int]
) -> list[str]:
    """T7: word BIO labels -> subword BIO labels (continuations get I-)."""
    out: list[str] = []
    prev_wid = None
    for wid in word_ids:
        lab = word_labels[wid]
        if wid == prev_wid and lab.startswith("B-"):
            lab = "I-" + lab[2:]
        out.append(lab)
        prev_wid = wid
    return out


def shift_mod_labels(
    word_mods: list[str], word_ids: list[int]
) -> list[str]:
    """T8: word modality -> subword modality on the word's LAST subword."""
    out = ["_"] * len(word_ids)
    for i, wid in enumerate(word_ids):
        is_last = i + 1 == len(word_ids) or word_ids[i + 1] != wid
        if is_last:
            out[i] = word_mods[wid]
    return out


def expand_masks(word_mask: list[int], word_ids: list[int]) -> list[int]:
    """T9: word-level 0/1 entity masks repeated over subwords."""
    return [word_mask[wid] for wid in word_ids]


def collapse_to_words(
    subwords: list[str],
    word_ids: list[int],
    sbw_ner: list[str],
    sbw_mod: list[str],
    sbw_rel_lists: list[list[str]],
    sbw_head_lists: list[list[int]],
) -> tuple[list[str], list[str], list[str], list[list[str]], list[list[int]]]:
    """T10: subword-level predictions -> word-level.

    NER from each word's FIRST subword; modality from its LAST subword;
    relation anchors and head ids remapped subword-id -> word-id with
    duplicates merged (a relation predicted on any subword of the anchor word
    counts once).
    """
    n_words = (word_ids[-1] + 1) if word_ids else 0
    tokens = [""] * n_words
    ner = ["O"] * n_words
    mod = ["_"] * n_words
    rels: list[list[str]] = [[] for _ in range(n_words)]
    heads: list[list[int]] = [[] for _ in range(n_words)]

    for i, (piece, wid) in enumerate(zip(subwords, word_ids)):
        frag = piece[2:] if piece.startswith("##") else piece
        if i == 0 or word_ids[i - 1] != wid:  # first subword of the word
            ner[wid] = sbw_ner[i]
        tokens[wid] += frag
        is_last = i + 1 == len(word_ids) or word_ids[i + 1] != wid
        if is_last:
            mod[wid] = sbw_mod[i]

    for i, (rl, hl) in enumerate(zip(sbw_rel_lists, sbw_head_lists)):
        wid = word_ids[i]
        for rel, head_sbw in zip(rl, hl):
            head_wid = word_ids[head_sbw] if 0 <= head_sbw < len(word_ids) else head_sbw
            if (rel, head_wid) not in zip(rels[wid], heads[wid]):
                rels[wid].append(rel)
                heads[wid].append(head_wid)

    return tokens, ner, mod, rels, heads


def within_length_limit(subwords: list[str], limit: int = MAX_SUBWORDS) -> bool:
    """T12: model sequence-length gate (filter BEFORE inference)."""
    return len(subwords) <= limit


def document_sent_mask(tokens: list[str], sep_tok: str = "[SEP]") -> list[int]:
    """B6: alternating 0/1 token_type_ids flipping AFTER each in-band [SEP]
    (reference ``document_sent_mask`` utils.py:2081-2089) — the sentence mask
    the doc-level trunk mode feeds the encoder. The [SEP] token itself keeps
    the pre-flip value, exactly as in the reference."""
    flip = 0
    out: list[int] = []
    for t in tokens:
        out.append(flip)
        if t == sep_tok:
            flip = 1 - flip
    return out
