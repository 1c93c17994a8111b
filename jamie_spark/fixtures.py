"""Deterministic synthetic corpus generator (FIXTURES.md §1-§4).

Generates Common-Crawl-style ``pages`` rows in exactly the BASELINE.json
``input_hint`` shape — ``(url, warc_ts, html, text, lang)`` — together with
MedTxt-style gold annotations (mentions / relations / mention-triples) derived
from template metadata, NOT from the tagger, so the e2e P/R gate is a real
comparison.

Sentences are instantiated from a fixed template grammar over the concept
dictionary (jamie_spark.concepts). Every template records which slots carry
entities, their modality, and which relation rules apply — mirroring the
reference's annotated-XML semantics: relations anchored on span-final tokens
(reference ``utils.py:804-814``), DCT self-loops (``utils.py:687-691``),
modality on span-final token (``data_objects.py:226-229``), tid assignment in
document order (``data_objects.py:272-277``).

Byte-identity contract: ``textnorm.extract_text(html) == text`` per url,
where ``html`` wraps the text blocks in boilerplate (nav/header/footer) that
the extractor must strip.

Everything is seeded ``random.Random(seed)`` — same (n_docs, seed) always
yields the same corpus on any machine.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from . import concepts
from .textnorm import escape_html
from .tokenizer import tokenize

# --- template grammar -------------------------------------------------------
# part = literal string | (slot_role,) placeholder
# slot roles: dis / anat / drug / time / key / val

_T_FINDING = ("time", "、", "anat", "に", "dis", "を認める。")
_T_SUSPECT = ("anat", "に", "dis", "の疑いがある。")
_T_NEGATED = ("dis", "は認められない。")
_T_DRUG_EXEC = ("drug", "を投与した。")
_T_DRUG_SCHED = ("drug", "の投与を予定している。")
_T_TESTVAL = ("key", "は", "val", "であった。")
_T_JASP = ("time", "、", "anat", "　", "dis", "あり。")
_T_PLAIN = ("その後、経過は良好である。",)
# two key/value pairs in ONE sentence: each value must link to its nearest
# PRECEDING key only (reference value-relation semantics; the stand-in's
# max(preceding) rule). Probes the all-pairs failure mode a single-pair
# sentence can never catch — the r4 compiled checkpoint linked both values
# to both keys here.
_T_TESTVAL2 = ("key", "は", "val", "、", "key", "は", "val", "であった。")
# a multi-subword drug between the disease and the 疑 cue: the cue sits
# within 6 WORDS of the span (the stand-in's window) but, when the drug
# splits into 3 pieces, beyond 6 SUBWORDS — probes word-exact window
# accounting in the compiled forward (the r4 checkpoint missed the cue and
# decoded 'positive').
_T_SUSPECT_FAR = ("dis", "の", "drug", "投与後も疑いが残る。")

TEMPLATES = [
    _T_FINDING,
    _T_SUSPECT,
    _T_NEGATED,
    _T_DRUG_EXEC,
    _T_DRUG_SCHED,
    _T_TESTVAL,
    _T_JASP,
    _T_PLAIN,
    _T_TESTVAL2,
    _T_SUSPECT_FAR,
]

_ROLES = {"dis", "anat", "drug", "time", "key", "val"}

_ROLE_TAG = {
    "dis": "d",
    "anat": "a",
    "drug": "r",
    "time": "TIMEX3",
    "key": "t-key",
    "val": "t-val",
}

# template -> disease certainty / drug state (gold modality, from the grammar)
_TEMPLATE_MOD = {
    id(_T_FINDING): {"dis": "positive"},
    id(_T_SUSPECT): {"dis": "suspicious"},
    id(_T_NEGATED): {"dis": "negative"},
    id(_T_DRUG_EXEC): {"drug": "executed"},
    id(_T_DRUG_SCHED): {"drug": "scheduled"},
    id(_T_TESTVAL): {},
    id(_T_JASP): {"dis": "positive"},
    id(_T_PLAIN): {},
    id(_T_TESTVAL2): {},
    id(_T_SUSPECT_FAR): {"dis": "suspicious", "drug": "executed"},
}

_EN_WORDS = (
    "the quick crawl fetched this page and found only boilerplate text "
    "with no clinical content at all"
).split()


def _pick_surface(rng: random.Random, role: str) -> str:
    if role == "dis":
        return rng.choice(concepts.DISEASES)
    if role == "anat":
        return rng.choice(concepts.ANATOMY)
    if role == "drug":
        return rng.choice(concepts.DRUGS)
    if role == "time":
        return rng.choice(sorted(concepts.TIMES))
    if role == "key":
        return rng.choice(concepts.TEST_KEYS)
    if role == "val":
        return rng.choice(concepts.TEST_VALS)
    raise ValueError(role)


class _Slot:
    __slots__ = ("role", "surface", "tag", "mod", "begin", "end")

    def __init__(self, role: str, surface: str, tag: str, mod: str):
        self.role = role
        self.surface = surface
        self.tag = tag
        self.mod = mod
        self.begin = -1
        self.end = -1


def _instantiate(rng: random.Random, template: tuple) -> tuple[str, list[_Slot]]:
    """Fill a template; compute token spans for every slot.

    Asserts that tokenization is compositional across part boundaries (the
    grammar guarantees class changes at every boundary), so slot spans are
    exact under the pinned tokenizer.
    """
    mods = _TEMPLATE_MOD[id(template)]
    parts: list[tuple[str, _Slot | None]] = []
    slots: list[_Slot] = []
    for part in template:
        if part in _ROLES:
            surface = _pick_surface(rng, part)
            tag = _ROLE_TAG[part]
            if part == "time":
                mod = concepts.TIMES[surface]
            else:
                mod = mods.get(part, "_")
            slot = _Slot(part, surface, tag, mod)
            slots.append(slot)
            parts.append((surface, slot))
        else:
            parts.append((part, None))

    sentence = "".join(p for p, _ in parts)
    offset = 0
    all_toks: list[str] = []
    for text, slot in parts:
        toks = tokenize(text)
        if slot is not None:
            slot.begin = offset
            slot.end = offset + len(toks)
        offset += len(toks)
        all_toks.extend(toks)
    assert all_toks == tokenize(sentence), (
        f"non-compositional tokenization for {sentence!r}"
    )
    return sentence, slots


def _sentence_relations(slots: list[_Slot]) -> list[tuple[_Slot, _Slot, str]]:
    """Gold relations from the grammar (same rule set the corpus encodes)."""
    rels: list[tuple[_Slot, _Slot, str]] = []
    ds = [s for s in slots if s.role == "dis"]
    anats = [s for s in slots if s.role == "anat"]
    times = [s for s in slots if s.role == "time"]
    keys = [s for s in slots if s.role == "key"]
    vals = [s for s in slots if s.role == "val"]
    for d in ds:
        for a in anats:
            rels.append((d, a, concepts.REL_REGION))
        for t in times:
            rels.append((d, t, concepts.REL_TIME))
        if times:
            rels.append((d, d, concepts.DCT_ON))  # DCT self-loop
    for v in vals:
        preceding = [k for k in keys if k.end <= v.begin]
        if preceding:
            rels.append((v, max(preceding, key=lambda k: k.end), concepts.REL_VALUE))
    return rels


def _nav_links(doc_id: int, topic_term: str | None = None) -> str:
    """Deterministic outlinks for the page's <nav> — pure function of
    (doc_id, the doc's own first disease surface), so the distributed
    generator stays embarrassingly parallel. The three base links exercise
    the URL-normalizer's rule set exactly once each: a fragment, an
    uppercase host + default port + tracking params (raw ``&`` separators,
    as on the real web), and a mirror host with a trailing slash. Pages
    that mention a disease add a fourth TOPIC link whose anchor text names
    the entity (the classic anchor-text entity-linking signal: many pages
    pointing at one topic URL with a concept surface in the anchor);
    doc_id mod 40 folds them onto shared topic pages. All links live
    OUTSIDE <article>, so the boilerplate-stripped text — and every
    pipeline gold — is untouched."""
    t1 = doc_id * 3 + 1
    t2 = doc_id + 7
    ext = doc_id % 5
    links = (
        f'<a href="https://fixture.test/doc/{t1}#sec{doc_id % 3}">関連記事 {t1}</a>'
        f'<a href="HTTPS://Fixture.TEST:443/doc/{t2}?utm_source=nav&id={t2 % 4}'
        f'&ref=footer">特集 {t2}</a>'
        f'<a href="https://mirror{ext}.fixture.test/doc/{doc_id}/">ミラー {doc_id}</a>'
    )
    if topic_term is not None:
        links += (
            f'<a href="https://fixture.test/topic/{doc_id % 40}">'
            f"{escape_html(topic_term)}の解説</a>"
        )
    return links


def _make_html(
    sentences: list[str], doc_id: int, topic_term: str | None = None
) -> str:
    body = "".join(f"<p>{escape_html(s)}</p>" for s in sentences)
    return (
        "<html><head><title>fixture</title><script>var x=1;</script></head>"
        f"<body><nav>ナビゲーション {doc_id}"
        f"{_nav_links(doc_id, topic_term)}</nav>"
        f"<article>{body}</article>"
        "<footer>コピーライト fixture.test</footer></body></html>"
    )


def gen_corpus(
    n_docs: int, seed: int = 42, skew: bool = False
) -> tuple[list[dict], list[dict], list[dict], list[dict]]:
    """Generate (pages, gold_mentions, gold_relations, gold_triples) rows.

    * pages: (url, warc_ts, html, text, lang) — html as utf-8 bytes.
    * gold_mentions: (url, sent_id, begin_tok, end_tok, ner_tag, mod_tag,
      tid, surface)
    * gold_relations: (url, arg1_tid, arg2_tid, reltype); arg1==arg2 = DCT.
    * gold_triples: (url, sent_id, subj_surface, pred, obj_surface) —
      mention-triplet semantics, reference data_objects.py:251-265.

    ``skew=True`` forces the head disease 肺癌 into ~30% of sentences
    (FIXTURES.md §6, for the salted-partitioning test).
    """
    pages: list[dict] = []
    gold_mentions: list[dict] = []
    gold_relations: list[dict] = []
    gold_triples: list[dict] = []
    for doc_id in range(n_docs):
        page, m, r, t = gen_doc(doc_id, seed, skew)
        pages.append(page)
        gold_mentions.extend(m)
        gold_relations.extend(r)
        gold_triples.extend(t)
    return pages, gold_mentions, gold_relations, gold_triples


def gen_doc(
    doc_id: int, seed: int = 42, skew: bool = False
) -> tuple[dict, list[dict], list[dict], list[dict]]:
    """Generate ONE document + its gold rows, independently of all others.

    Per-doc RNG ``Random((seed, doc_id))`` makes generation embarrassingly
    parallel: the distributed generator (:func:`pages_df_distributed`) calls
    this from executors and produces byte-identical pages to the driver-side
    :func:`gen_corpus` loop — no driver bottleneck at bench scale.
    """
    rng = random.Random(f"{seed}:{doc_id}")
    t0 = datetime(2026, 1, 1)
    url = f"https://fixture.test/doc/{doc_id}"
    warc_ts = t0 + timedelta(minutes=doc_id % 525600)

    if rng.random() < 0.05:
        n_words = rng.randint(8, 16)
        text = " ".join(rng.choice(_EN_WORDS) for _ in range(n_words))
        page = {
            "url": url,
            "warc_ts": warc_ts,
            "html": _make_html([text], doc_id).encode("utf-8"),
            "text": text,
            "lang": "en",
        }
        return page, [], [], []

    n_sents = rng.randint(2, 5)
    sentences: list[str] = []
    doc_slots: list[tuple[int, list[_Slot]]] = []
    for sent_id in range(n_sents):
        template = rng.choice(TEMPLATES if rng.random() < 0.9 else [_T_PLAIN])
        if template is _T_PLAIN:
            sentences.append(_T_PLAIN[0])
            doc_slots.append((sent_id, []))
            continue
        sentence, slots = _instantiate(rng, template)
        if skew and any(s.role == "dis" for s in slots) and rng.random() < 0.45:
            # rebuild with the head entity pinned
            for s in slots:
                if s.role == "dis":
                    s.surface = "肺癌"
            offset = 0
            rebuilt: list[str] = []
            # consume each slot exactly once, in template order: picking by
            # role alone would bind the SAME slot twice if a template ever
            # repeats a role (corrupting gold spans); _instantiate emits
            # slots in template order, so first-match + remove is stable
            unbound = list(slots)
            for part in template:
                if part in _ROLES:
                    slot = next(s for s in unbound if s.role == part)
                    unbound.remove(slot)
                    toks = tokenize(slot.surface)
                    slot.begin, slot.end = offset, offset + len(toks)
                    offset += len(toks)
                    rebuilt.append(slot.surface)
                else:
                    offset += len(tokenize(part))
                    rebuilt.append(part)
            sentence = "".join(rebuilt)
        sentences.append(sentence)
        doc_slots.append((sent_id, slots))

    text = "\n".join(sentences)
    topic_term = next(
        (
            s.surface
            for _, slots in doc_slots
            for s in slots
            if s.role == "dis"
        ),
        None,
    )
    page = {
        "url": url,
        "warc_ts": warc_ts,
        "html": _make_html(sentences, doc_id, topic_term).encode("utf-8"),
        "text": text,
        "lang": "ja",
    }

    gold_mentions: list[dict] = []
    gold_relations: list[dict] = []
    gold_triples: list[dict] = []
    # tids in document order (reference data_objects.py:272-277)
    tid = 0
    slot_tid: dict[int, str] = {}
    for sent_id, slots in doc_slots:
        for slot in sorted(slots, key=lambda s: s.begin):
            tid += 1
            slot_tid[id(slot)] = f"T{tid}"
            gold_mentions.append(
                {
                    "url": url,
                    "sent_id": sent_id,
                    "begin_tok": slot.begin,
                    "end_tok": slot.end,
                    "ner_tag": slot.tag,
                    "mod_tag": slot.mod,
                    "tid": f"T{tid}",
                    "surface": slot.surface,
                }
            )
        for tail, head, rel in _sentence_relations(slots):
            gold_relations.append(
                {
                    "url": url,
                    "arg1_tid": slot_tid[id(tail)],
                    "arg2_tid": slot_tid[id(head)],
                    "reltype": rel,
                }
            )
            gold_triples.append(
                {
                    "url": url,
                    "sent_id": sent_id,
                    "subj_surface": tail.surface,
                    "pred": rel,
                    "obj_surface": head.surface,
                }
            )
    return page, gold_mentions, gold_relations, gold_triples


# --- Spark loaders -----------------------------------------------------------

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"
GOLD_MENTIONS_DDL = (
    "url string, sent_id int, begin_tok int, end_tok int, "
    "ner_tag string, mod_tag string, tid string, surface string"
)
GOLD_RELATIONS_DDL = "url string, arg1_tid string, arg2_tid string, reltype string"
GOLD_TRIPLES_DDL = (
    "url string, sent_id int, subj_surface string, pred string, obj_surface string"
)


def pages_df(spark, n_docs: int, seed: int = 42, skew: bool = False):
    pages, _, _, _ = gen_corpus(n_docs, seed, skew)
    return spark.createDataFrame(pages, schema=PAGES_DDL)


def pages_df_distributed(
    spark, n_docs: int, seed: int = 42, skew: bool = False, n_partitions: int | None = None
):
    """Distributed corpus synthesis: ``spark.range`` -> per-doc generation on
    executors. Byte-identical to :func:`pages_df` (same per-doc RNG) with no
    driver-side materialization — this is how the bench corpus scales."""
    import pandas as pd

    n_partitions = n_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [gen_doc(int(i), seed, skew)[0] for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(rows)

    return (
        spark.range(0, n_docs, numPartitions=n_partitions)
        .mapInPandas(gen, schema=PAGES_DDL)
    )


def boilerplate_docs_df(
    spark, n_docs: int, seed: int = 42, n_phrases: int = 50,
    n_partitions: int = 32,
):
    """documents(doc_id, text) stress corpus for dedup at scale: every doc
    carries 8 unique content words plus a POWER-LAW boilerplate footer —
    a log-uniform phrase draw (P(phrase k) ~ 1/k over ``n_phrases``) whose
    tail 6 words ("terms of service all rights reserved") are UNIVERSAL, so
    their shingles hit ~100% document frequency, the worst case for both the
    max_df verify cap and the MAX_BAND_BUCKET candidate cap. Every 97th doc
    is a near-duplicate of its predecessor (same unique words + phrase, one
    trailing word added -> Jaccard ~0.93), giving the dedup a known answer
    key. Fully JVM-side generation (no python workers), deterministic in
    ``seed``.
    """
    base = F.when(
        (F.col("id") % 97 == 0) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    u = F.pmod(F.xxhash64(base, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0
    phrase = F.floor(F.pow(F.lit(float(n_phrases)), u)).cast("long")
    uniq = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("u"), base.cast("string"), F.lit(f"w{j}"))
            for j in range(8)
        ],
    )
    boiler = F.concat(
        F.lit("footer"),
        phrase.cast("string"),
        F.lit(" terms of service all rights reserved"),
    )
    extra = F.when(
        (F.col("id") % 97 == 0) & (F.col("id") > 0),
        F.concat(F.lit(" x"), F.col("id").cast("string")),
    ).otherwise(F.lit(""))
    return spark.range(0, n_docs, numPartitions=n_partitions).select(
        F.col("id").alias("doc_id"),
        F.concat(uniq, F.lit(" "), boiler, extra).alias("text"),
    )


def gold_dfs(spark, n_docs: int, seed: int = 42, skew: bool = False):
    _, mentions, relations, triples = gen_corpus(n_docs, seed, skew)
    return (
        spark.createDataFrame(mentions, schema=GOLD_MENTIONS_DDL),
        spark.createDataFrame(relations, schema=GOLD_RELATIONS_DDL),
        spark.createDataFrame(triples, schema=GOLD_TRIPLES_DDL),
    )


def concept_df(spark):
    return spark.createDataFrame(
        concepts.concept_rows(),
        schema="concept_id string, canonical string, alias string, sem_type string",
    )


def zipf_edges_md5_df(spark, n_edges: int = 5000, n_nodes: int = 10000):
    """Engine-PORTABLE power-law edge fixture (src, dst): endpoint node id =
    ``n_nodes DIV (1 + h % n_nodes)`` with h a 32-bit md5 prefix — the
    harmonic floor map sends a uniform draw u to node s with probability
    ~1/(s(s+1)), i.e. node N1 takes ~half of all endpoint mass and the tail
    decays as a true power law. Pure integer arithmetic over md5, so DuckDB
    reproduces the edge set bit-for-bit (zipf_edges_df's xxhash64 draw is
    engine-private — fine for bench stress, unusable for value oracles)."""

    def node(salt: str) -> str:
        h = (
            f"cast(conv(substring(md5(concat('{salt}',"
            f" cast(id as string))), 1, 8), 16, 10) as bigint)"
        )
        return (
            f"concat('N', cast({n_nodes} div (1 + pmod({h}, {n_nodes}))"
            f" as string))"
        )

    from pyspark.sql import functions as SF

    return spark.range(0, n_edges).select(
        SF.expr(node("a")).alias("src"), SF.expr(node("b")).alias("dst")
    )


def zipf_edges_df(
    spark,
    n_edges: int,
    n_nodes: float,
    seeds: tuple[int, int] = (17, 23),
    num_partitions: int = 32,
):
    """Deterministic power-law directed edge set (src, dst): both endpoints
    drawn log-uniformly over [1, n_nodes] (node ``N1`` is the mega-hub with
    ~ln2/ln(n_nodes) of all endpoint draws) — the canonical web-KG degree
    distribution. Single source for the kgstats skew tests AND the bench
    graph-stress stage: the generator IS the skew contract, so the two must
    never drift."""

    def draw(seed):
        u = F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(1_000_000)) / 1e6
        return F.concat(
            F.lit("N"), F.floor(F.pow(F.lit(float(n_nodes)), u)).cast("string")
        )

    return spark.range(0, n_edges, numPartitions=num_partitions).select(
        draw(seeds[0]).alias("src"), draw(seeds[1]).alias("dst")
    )
