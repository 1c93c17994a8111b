"""jamie_spark — a brand-new PySpark-native knowledge-graph construction engine.

Re-expresses the semantics of the JaMIE medical information-extraction stack
(reference: racerandom/JaMIE, surveyed in SURVEY.md) as an idiomatic Spark
DataFrame pipeline over Common-Crawl-style page tables:

    pages(url, warc_ts, html, text, lang)
      -> extract (byte-identical text per url)        [textnorm]
      -> segment -> tokenize -> joint NER/mod/rel tag [segment, tokenizer, infer]
      -> mentions + triples                           [mentions]
      -> entity linking (MinHash-LSH + rerank)        [link]
      -> canonicalization (connected components)      [canon]
      -> graph materialization (salted, bucketed)     [graph]
      -> lineage + idempotent resume                  [lineage]

Everything heavy runs JVM-side (built-in functions) or in a single Arrow-batched
``mapInPandas`` stage; there is no per-row Python anywhere in the hot path.
"""

__version__ = "0.1.0"
