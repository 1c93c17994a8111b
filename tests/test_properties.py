"""Property-based tests (hypothesis) for the pure algebraic core."""

from hypothesis import given, settings
from hypothesis import strategies as st

from jamie_spark import bio
from jamie_spark.textnorm import IDEOGRAPHIC_SPACE, JASP, han_to_zen, zen_to_han
from jamie_spark.tokenizer import split_sentences, tokenize

TAGS = ["d", "a", "r", "TIMEX3", "t-key", "t-val"]

bio_tags = st.lists(
    st.one_of(
        st.just("O"),
        st.sampled_from([f"B-{t}" for t in TAGS]),
        st.sampled_from([f"I-{t}" for t in TAGS]),
    ),
    min_size=0,
    max_size=24,
)


@given(bio_tags)
@settings(max_examples=300)
def test_bio_to_spans_total_and_wellformed(tags):
    """Never raises on any B/I/O sequence; spans are ordered, non-overlapping,
    in-bounds, non-empty, and every non-O token is covered by exactly one span
    (reference bio_to_spans tolerates all malformed transitions)."""
    spans = bio.bio_to_spans(tags)
    prev_end = 0
    covered = set()
    for tag, b, e in spans:
        assert 0 <= b < e <= len(tags)
        assert b >= prev_end
        prev_end = e
        assert tag in TAGS
        covered.update(range(b, e))
    assert covered == {i for i, t in enumerate(tags) if t != "O"}


@st.composite
def span_sets(draw):
    n = draw(st.integers(min_value=0, max_value=20))
    spans = []
    pos = 0
    while pos < n:
        gap = draw(st.integers(min_value=0, max_value=3))
        b = pos + gap
        if b >= n:
            break
        e = draw(st.integers(min_value=b + 1, max_value=n))
        spans.append((draw(st.sampled_from(TAGS)), b, e))
        pos = e
    return n, spans


@given(span_sets())
@settings(max_examples=300)
def test_spans_bio_roundtrip(ns):
    """spans -> BIO -> spans is the identity for any well-formed span set —
    EXCEPT adjacent same-tag spans, which BIO cannot distinguish from one
    span... so we re-encode and require a fixpoint instead of raw equality."""
    n, spans = ns
    tags = bio.spans_to_bio(n, spans)
    decoded = bio.bio_to_spans(tags)
    assert bio.spans_to_bio(n, decoded) == tags
    # same total coverage
    assert {i for _, b, e in spans for i in range(b, e)} == {
        i for _, b, e in decoded for i in range(b, e)
    }


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=300)
def test_tokenize_lossless_modulo_whitespace(s):
    """Concatenating tokens (JASP decoded) reproduces the input minus ASCII
    whitespace — tokenization never drops or invents content."""
    s = s.replace("\n", "").replace("。", "")  # single-sentence input
    toks = tokenize(s)
    rebuilt = "".join(
        IDEOGRAPHIC_SPACE if t == JASP else t for t in toks
    )
    expected = "".join(ch for ch in s if ch not in (" ", "\t", "\r"))
    assert rebuilt == expected


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=200)
def test_sentence_split_preserves_content(s):
    joined = "".join(split_sentences(s))
    expected = "".join(
        ch for ch in s.replace("\n", "") if True
    )
    # split only strips spaces at sentence edges and drops newlines
    assert joined.replace(" ", "") == s.replace("\n", "").replace(" ", "")


_VOCAB_CHARS = "abcdefgh"


@st.composite
def words_and_labels(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    words = [
        draw(st.text(alphabet=_VOCAB_CHARS, min_size=1, max_size=6))
        for _ in range(n)
    ]
    labels = ["O"] * n
    i = 0
    while i < n:
        if draw(st.booleans()):
            tag = draw(st.sampled_from(TAGS))
            end = min(n, i + draw(st.integers(min_value=1, max_value=3)))
            labels[i] = f"B-{tag}"
            for j in range(i + 1, end):
                labels[j] = f"I-{tag}"
            i = end
        else:
            i += 1
    mods = [
        draw(st.sampled_from(["_", "positive", "negative"])) for _ in range(n)
    ]
    return words, labels, mods


@given(words_and_labels())
@settings(max_examples=200)
def test_subword_expand_collapse_roundtrip(wl):
    """word -> subword -> word is lossless for tokens, BIO and modality under
    ANY vocab (unknown pieces fall back to [UNK] + de-UNK restoration)."""
    from jamie_spark import subword as sw

    words, labels, mods = wl
    vocab = {"a", "b", "##c", "##d", "ab", "##ba", "e"}  # partial on purpose
    sbw, wid = sw.tokenize_subwords(words, vocab)
    restored = sw.restore_unk(sbw, wid, words)
    sbw_ner = sw.expand_ner_labels(labels, wid)
    sbw_mod = sw.shift_mod_labels(mods, wid)
    toks2, ner2, mod2, _, _ = sw.collapse_to_words(
        restored, wid, sbw_ner, sbw_mod, [[] for _ in sbw], [[] for _ in sbw]
    )
    assert toks2 == words
    assert ner2 == labels
    assert mod2 == mods


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=200)
def test_width_roundtrip(s):
    """zen_to_han is exactly inverted by han_to_zen on the full-width block."""
    z = han_to_zen(s)
    assert han_to_zen(zen_to_han(z)) == z


@given(
    st.lists(st.integers(min_value=0, max_value=600), max_size=30),
    st.integers(min_value=1, max_value=510),
)
@settings(max_examples=300)
def test_chunk_sentences_tiles_exactly(lens, max_len):
    """T11 invariants for ANY length profile: chunks tile [0, n) exactly in
    order, every chunk is non-empty, and a chunk only exceeds max_len when
    it holds a single (oversized) sentence."""
    from jamie_spark.tokenizer import chunk_sentences

    chunks = chunk_sentences(lens, max_len)
    if not lens:
        assert chunks == []
        return
    assert chunks[0][0] == 0 and chunks[-1][1] == len(lens)
    for (a, b), (c, _) in zip(chunks, chunks[1:]):
        assert b == c
    for a, b in chunks:
        assert b > a
        if b - a > 1:
            assert sum(lens[a:b]) <= max_len


@st.composite
def conll_doc(draw):
    sents = []
    for sid in range(draw(st.integers(min_value=1, max_value=4))):
        n = draw(st.integers(min_value=1, max_value=8))
        toks = [
            draw(st.sampled_from(["肺癌", "を", "ab", "[JASP]", "x1", "。"]))
            for _ in range(n)
        ]
        ner = [
            draw(st.sampled_from(["O", "B-d", "I-d", "B-a"])) for _ in range(n)
        ]
        mods = [draw(st.sampled_from(["_", "positive"])) for _ in range(n)]
        rels, heads = [], []
        for i in range(n):
            k = draw(st.integers(min_value=0, max_value=2))
            rels.append([draw(st.sampled_from(["region", "value"])) for _ in range(k)])
            heads.append([draw(st.integers(min_value=0, max_value=n - 1)) for _ in range(k)])
        sents.append((sid, toks, ner, mods, rels, heads))
    return sents


@given(conll_doc())
@settings(max_examples=200, deadline=None)
def test_conll_roundtrip_property(sents):
    """CONLL writer -> parser is the identity for arbitrary annotations
    (modulo the writer's null-cell padding ['N']/[i] for empty relation
    lists), including in-band [JASP] tokens."""
    from jamie_spark import conll

    lines = ["#doc u"]
    for sid, toks, ner, mods, rels, heads in sents:
        lines.append(f"## line {sid}")
        lines.extend(conll.sentence_to_conll_lines(toks, ner, mods, rels, heads))
    rows = conll.parse_conll("\n".join(lines) + "\n")
    assert len(rows) == len(sents)
    for row, (sid, toks, ner, mods, rels, heads) in zip(rows, sents):
        assert row["sent_id"] == sid
        assert row["tokens"] == toks
        assert row["ner"] == ner
        assert row["mod"] == mods
        for i in range(len(toks)):
            want = (rels[i], heads[i]) if rels[i] else (["N"], [i])
            assert (row["rels"][i], row["heads"][i]) == want


@given(st.lists(st.sampled_from(["[SEP]", "a", "bb", "[CLS]"]), max_size=20))
@settings(max_examples=300)
def test_document_sent_mask_properties(toks):
    """B6 invariants: 0/1 values, same length, flips exactly AFTER each
    [SEP] and nowhere else."""
    from jamie_spark.subword import document_sent_mask

    m = document_sent_mask(toks)
    assert len(m) == len(toks)
    assert set(m) <= {0, 1}
    for i in range(1, len(toks)):
        if toks[i - 1] == "[SEP]":
            assert m[i] == 1 - m[i - 1]
        else:
            assert m[i] == m[i - 1]


# --- quantile-sketch bucket arithmetic (textstats.quantile_sketch spec) ----
# Pure twin of the Column expressions: octave = bit_length(t)-1, k linear
# sub-buckets by shift+div, representative = bucket lower bound. The Spark
# and DuckDB sides are value-compared at sf0.01 by the oracle; these
# properties prove the ERROR BOUND and monotonicity for ALL ticks, not just
# the test corpus.

def _qs_bucket(t: int, k: int) -> int:
    if t <= 0:
        return -1
    e = t.bit_length() - 1
    return e * k + ((t - (1 << e)) * k) // (1 << e)


def _qs_rep(bucket: int, k: int) -> int:
    if bucket < 0:
        return 0
    e, sub = divmod(bucket, k)
    return (1 << e) + (sub << e) // k


@given(st.integers(min_value=1, max_value=1 << 50))
@settings(max_examples=500)
def test_quantile_bucket_error_bound_and_order(t):
    from jamie_spark.textstats import QS_K

    b = _qs_bucket(t, QS_K)
    rep = _qs_rep(b, QS_K)
    # representative is the bucket LOWER bound: rep <= t, relative error
    # strictly under 1/k plus one integer tick of slack
    assert rep <= t
    assert (t - rep) <= (1 << (t.bit_length() - 1)) // QS_K + 1
    assert (t - rep) / t <= 1.0 / QS_K + 1.0 / t
    # bucket ids and representatives are monotone in t
    b2 = _qs_bucket(t + 1, QS_K)
    assert b2 >= b
    assert _qs_rep(b2, QS_K) >= rep


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=200)
)
@settings(max_examples=200)
def test_cms_min_over_rows_never_undercounts(keys):
    """Pure twin of the CMS estimate: counters built with the same
    md5-derived slots, estimate = min over rows — est >= true for EVERY key
    in EVERY multiset (the one-sided bound is structural, not statistical)."""
    import hashlib

    from jamie_spark.textstats import CMS_ROWS, CMS_WIDTH

    def slot(row, key):
        h = hashlib.md5(f"{row}:{key}".encode()).hexdigest()[:8]
        return int(h, 16) % CMS_WIDTH

    counters = [[0] * CMS_WIDTH for _ in range(CMS_ROWS)]
    true = {}
    for key in keys:
        true[key] = true.get(key, 0) + 1
        for r in range(CMS_ROWS):
            counters[r][slot(r, key)] += 1
    for key, t in true.items():
        est = min(counters[r][slot(r, key)] for r in range(CMS_ROWS))
        assert est >= t
