"""commoncrawl_spark — a PySpark-native crawl/frontier + extraction engine.

A from-scratch re-implementation of the *capabilities* of the reference
pipeline (linsenwang/commoncrawl: WARC download / filter / merge / extract)
as an idiomatic Spark DataFrame engine:

- pages/CDX/article data live in partitioned, snapshot-committed tables
  (``tables.SnapshotTable`` — an Iceberg-style layer over Parquet);
- per-record transforms are native Catalyst expressions wherever possible;
  exactly three things stay Python, all vectorized over Arrow batches:
  article extraction, URL canonicalization (punycode), and per-bucket
  Bloom filters for the seen-set;
- the crawl loop is a driver-side round scheduler (frontier -> politeness
  window -> fetch join -> extract -> commit), checkpoint-resumable.

Package layout:
  functions/   scalar + pandas-UDF building blocks (urls, extract, text)
  operators/   dataflow operators (dedup, seen_set, frontier, similarity, ...)
  sources/     ingest helpers (CDX JSONL, WARC binary)
  streaming/   Structured Streaming variants
  tables.py    snapshot table layer
  fixtures.py  deterministic synthetic test data (seed=42)
"""

__version__ = "0.1.0"
