"""Deterministic segmentation + tokenization (T2/T3 in SURVEY.md §2.2).

The reference tokenizes with MeCab/Juman++ behind ``MorphologicalAnalyzer``
(reference ``utils.py:28-60``) and segments with ``textformatting.ssplit``
(``utils.py:304,703``). Neither external analyzer exists in this environment,
and a port would not be Spark-first anyway; the engine instead pins its own
*versioned deterministic* tokenizer so that worker-side behavior is identical
everywhere (the property the reference gets implicitly from a single process —
SURVEY.md §7 "what's hard").

Grammar (TOKENIZER_VERSION bumps on any change):

* sentences end at ``。`` / ``！`` / ``？`` / newline (delimiter kept with the
  sentence, like ssplit);
* a token is a maximal run of characters of one class:
  KANJI / HIRAGANA / KATAKANA(+ー) / ASCII-alnum(+ ``.``) — after width
  normalization there are no full-width ASCII runs left;
* the ideographic space U+3000 becomes the in-band token ``[JASP]``
  (reference ``utils.py:399,678``); ASCII whitespace separates tokens and is
  dropped; every other character is a single-char token.

Pure functions only — they run inside the Arrow-batched extraction UDF
(jamie_spark.infer) and in the fixture generator, guaranteeing that gold spans
and pipeline spans are computed by the same grammar.
"""

from __future__ import annotations

from .textnorm import IDEOGRAPHIC_SPACE, JASP

TOKENIZER_VERSION = "jamie-spark-tok-2"  # tok-2: ASCII !? end sentences

# both widths of !/?: the pipeline normalizes width BEFORE splitting
# (infer applies zen_to_han first), so the full-width forms alone would
# never fire on the real path — '痛い！頭痛あり。' merged into ONE
# sentence, letting the per-sentence relation rules fire across what
# should be a boundary (spurious triples)
_SENT_END = ("。", "！", "？", "!", "?")


def split_sentences(text: str) -> list[str]:
    """Segment normalized text into sentences (T2).

    Newlines are hard boundaries; ``。！？`` end a sentence and stay attached.
    Empty sentences are dropped.
    """
    sentences: list[str] = []
    for line in text.split("\n"):
        buf: list[str] = []
        for ch in line:
            buf.append(ch)
            if ch in _SENT_END:
                sent = "".join(buf).strip(" ")
                if sent:
                    sentences.append(sent)
                buf = []
        tail = "".join(buf).strip(" ")
        if tail:
            sentences.append(tail)
    return sentences


def _char_class(ch: str) -> int:
    cp = ord(ch)
    if 0x4E00 <= cp <= 0x9FFF or cp in (0x3005,):  # kanji + 々
        return 1
    if 0x3040 <= cp <= 0x309F:  # hiragana
        return 2
    if 0x30A0 <= cp <= 0x30FF or cp == 0x30FC:  # katakana + ー
        return 3
    if ch.isascii() and (ch.isalnum() or ch == "."):
        return 4
    return 0  # punctuation / symbols: never merges


def tokenize(sentence: str) -> list[str]:
    """Tokenize one normalized sentence (T3). Deterministic char-class runs."""
    toks: list[str] = []
    run_cls = None
    buf: list[str] = []

    def flush() -> None:
        nonlocal buf, run_cls
        if buf:
            toks.append("".join(buf))
            buf = []
        run_cls = None

    for ch in sentence:
        if ch == IDEOGRAPHIC_SPACE:
            flush()
            toks.append(JASP)
            continue
        if ch in (" ", "\t", "\r"):
            flush()
            continue
        cls = _char_class(ch)
        if cls == 0:
            flush()
            toks.append(ch)
            continue
        if cls != run_cls:
            flush()
            run_cls = cls
        buf.append(ch)
    flush()
    return toks


def tokenize_text(text: str) -> list[list[str]]:
    """Segment + tokenize a whole document: list of token lists per sentence."""
    return [tokenize(s) for s in split_sentences(text)]


def chunk_sentences(
    sentence_lengths: list[int], max_len: int = 510
) -> list[tuple[int, int]]:
    """T11: greedy pack sentences into chunks of <= max_len units.

    Mirrors the reference's 512-subword document trunking
    (``utils.py:704-722`` with ``bert_sent_len`` per line): sentences are
    packed greedily in order; a sentence that alone exceeds ``max_len``
    becomes its own (oversized) chunk, to be dropped by the T12 length gate
    downstream rather than silently truncated.

    Returns (start_sentence, end_sentence_exclusive) per chunk. Intended for
    the document-level (trunked) real-model mode where cross-sentence context
    feeds one encoder window; the per-sentence hot path doesn't need chunks —
    it enforces the T12 length gate per sentence at runtime instead
    (jamie_spark.infer). Intra-row either way: a document is one row, so
    chunking never shuffles.
    """
    chunks: list[tuple[int, int]] = []
    start = 0
    acc = 0
    for i, n in enumerate(sentence_lengths):
        # flush on index (never truthiness of acc — zero-length sentences
        # must neither break the tiling nor ride along with an oversized one)
        if i > start and acc + n > max_len:
            chunks.append((start, i))
            start = i
            acc = 0
        acc += n
    if sentence_lengths:
        chunks.append((start, len(sentence_lengths)))
    return chunks
