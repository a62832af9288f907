"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl pipeline (CDX dedup -> status
gate -> politeness-scheduled fetch -> Arrow-UDF extraction) over pages
deterministically lifted from /root/testdata/sf0.001 documents.

``queries()`` / ``oracle_sql()`` cover the operator inventory of
SURVEY.md §2 plus the training-data extensions (dedup family, similarity
search, text analysis). Every oracle is plain DuckDB SQL over the
pre-registered views; every hash used by an operator is md5-derived so
Spark and DuckDB agree bit-for-bit. Floats are rounded identically on
both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from commoncrawl_spark.functions.text import (  # noqa: E402
    STOPWORDS,
    BPE_RE,
    PUNCT_RE,
    bpe_token_count_col,
    fingerprint_col,
    language_id_col,
    quality_features,
    quality_score_col,
    token_count_col,
)
from commoncrawl_spark.functions.urls import canonicalize_url_col  # noqa: E402
from commoncrawl_spark.operators.analytics import (  # noqa: E402
    explode_count,
    describe_numeric,
    keyword_filter,
    tokens_col,
    top_k,
    year_histogram,
)
from commoncrawl_spark.operators.dedup import best_capture_per_url  # noqa: E402
from commoncrawl_spark.operators.schedule import select_polite_batch  # noqa: E402
from commoncrawl_spark.operators.seen_set import (  # noqa: E402
    anti_join_seen,
    anti_join_seen_scalable,
)
from commoncrawl_spark.operators.similarity import cosine_topk, near_duplicate_pairs  # noqa: E402


def _await_stream(query, timeout: int) -> None:
    """Wait for an availableNow stream to FINISH before its sink is
    read. ``awaitTermination(t)`` returning False (slow host past the
    timeout) would otherwise silently yield partial output — a
    confusing red hash instead of a clear failure — so raise loudly; a
    query that died with an error raises from awaitTermination itself.
    """
    if not query.awaitTermination(timeout):
        query.stop()
        raise RuntimeError(
            f"stream did not finish within {timeout}s on this host — "
            "partial sink output would be silently wrong; rerun or "
            "raise the timeout")
from commoncrawl_spark.operators.text_dedup import (  # noqa: E402
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_buckets,
    simhash_col,
    simhash_near_duplicates,
)

NUM_HASHES, BANDS = 16, 4
SIM_BITS = 32


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # the local testdata files are single-row-group parquet (one split);
    # bench sets this so compute spreads the way a many-file table would
    n = os.environ.get("SPARK_GRAFT_REPARTITION")
    if n:
        df = df.repartition(int(n))
    return df


# ---------------------------------------------------------------------------
# shared SQL fragments (DuckDB side of each operator)
# ---------------------------------------------------------------------------

def _sql_canon(url: str) -> str:
    """DuckDB mirror of functions.urls.canonicalize_url_col (scheme'd URLs)."""
    rest = f"regexp_replace({url}, '^[a-zA-Z][a-zA-Z0-9+.-]*://', '')"
    host = (
        f"regexp_replace(lower(regexp_extract({rest}, '^([^/?#]*)', 1)), "
        f"'^www\\.', '')"
    )
    path = f"regexp_replace(regexp_extract({rest}, '^[^/?#]*([^?#]*)', 1), '/+$', '')"
    return f"({host} || {path})"


# mojibake damage injected by the mojibake_repair query: right-single-
# quote, e-acute and left-double-quote scars plus a cp1252 nbsp scar
# (raw UTF-8 in source; continuation chars include a C1 control
# and a non-breaking space)
_MOJI_SNIPPET = (" â€™Ã©"
                 "â€œtestÂ end")

_SQL_TOKS = (
    "list_filter(string_split_regex(lower({t}), '[^a-z0-9]+'), x -> x <> '')"
)


def _sql_stop_hits(toks: str, lang: str) -> str:
    vocab = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks}, t -> list_contains([{vocab}], t)))"


_SQL_SHINGLES = (
    "list_sort(list_distinct(CASE WHEN len({toks}) >= 3 THEN "
    "list_transform(range(1, len({toks}) - 1), "
    "i -> array_to_string(({toks})[i:i+2], ' ')) "
    "ELSE CAST([] AS VARCHAR[]) END))"
)

# messy-text fixture for text_normalize: typographic quotes/dashes,
# ellipsis, NBSP, zero-width space, a control byte, newline runs and
# trailing tabs — one exercise per NORMALIZE_PASSES entry. Python and
# DuckDB literals spell the SAME string with ASCII-only escapes.
_MESSY_JUNK = (
    "\u2018q\u2019 \u201Cd\u201D \u2013 \u2026 "
    "a\u00A0b\u200Bc\x07\n\n\n\n tail \t end "
)
# DuckDB e-strings escape control bytes with \xHH (only < 0x80 is
# legal there); non-ASCII text stays literal UTF-8 in the SQL source.
# Generated from the Python literal above -> the strings are equal.
_MESSY_JUNK_SQL = "e'" + "".join(
    "''" if c == "'" else
    f"\\x{ord(c):02X}" if ord(c) < 0x20 or ord(c) == 0x7F else c
    for c in _MESSY_JUNK) + "'"


# decomposed-Unicode fixture for nfc_normalize: combining-mark
# spellings (e + U+0301, a + U+030A, o + U+0308), singleton
# compositions (U+212B ANGSTROM SIGN -> U+00C5, U+2126 OHM SIGN ->
# U+03A9), and an already-composed é to show idempotence. Python and
# DuckDB spell the SAME string; non-ASCII stays literal UTF-8 in SQL.
_NFC_JUNK = (
    "e\u0301clair a\u030angstro\u0308m \u212b \u2126 \u00e9 fin"
)
_NFC_JUNK_SQL = "e'" + "".join(
    "''" if c == "'" else
    f"\\x{ord(c):02X}" if ord(c) < 0x20 or ord(c) == 0x7F else c
    for c in _NFC_JUNK) + "'"


def _sql_estr(s: str) -> str:
    """DuckDB e-string literal spelling the SAME string as the Python
    literal (control bytes as \\xHH, quotes doubled, UTF-8 verbatim)."""
    return "e'" + "".join(
        "''" if c == "'" else
        f"\\x{ord(c):02X}" if ord(c) < 0x20 or ord(c) == 0x7F else c
        for c in s) + "'"


# multi-line page fixture for c4_clean (documents.text is single-line
# word soup, so each C4 rule needs a synthetic line): one line per
# line-level rule, then a per-doc variant tail exercising each
# page-level drop reason. Same strings on both engines via _sql_estr.
_C4_LINE_JUNK = (
    "\nShort line.\n"
    "no terminal punctuation on this line\n"
    "Please enable JavaScript to view the comments powered by widgets.\n"
    "This boilerplate-free line survives the cleaning pass!\n"
)
_C4_VARIANTS = (
    "lorem ipsum dolor sit amet, consectetur adipiscing elit.",     # %5==0
    "if (x) { return y; } // stray code fragment",                  # %5==1
    "this page mentions badword1 in passing somewhere.",            # %5==2
    "One more good sentence here. Another good sentence follows!"   # %5==3
    " Does a question count as well? Yes it certainly does."
    " And one final declarative sentence to clear the bar.",
    "",                                                             # %5==4
)


def _sql_normalize(expr: str) -> str:
    """DuckDB twin of functions.text.normalize_text_col, generated from
    the same NORMALIZE_PASSES table."""
    from commoncrawl_spark.functions.text import NORMALIZE_PASSES

    for pat, rep in NORMALIZE_PASSES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "\\n")
        expr = f"regexp_replace({expr}, '{p}', e'{r}', 'g')"
    return f"regexp_replace({expr}, '^\\s+|\\s+$', '', 'g')"


# events -> synthetic CDX records (same construction on both sides)
_EV_URL_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("https://www.site-"), (F.col("user_id") % 40).cast("string"),
    F.lit(".test/item/"), (F.col("event_id") % 2500).cast("string"),
)
_EV_URL_SQL = (
    "'https://www.site-' || CAST(user_id % 40 AS VARCHAR) || "
    "'.test/item/' || CAST(event_id % 2500 AS VARCHAR)"
)


def _events_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id"),
        _EV_URL_SPARK().alias("url"),
        F.when(F.col("event_id") % 10 < 8, F.lit("200"))
        .when(F.col("event_id") % 10 == 8, F.lit("404"))
        .otherwise(F.lit("301")).alias("status"),
        F.when(F.col("event_id") % 7 == 0, F.lit("application/pdf"))
        .when(F.col("event_id") % 7 == 1, F.lit(None).cast("string"))
        .otherwise(F.lit("text/html")).alias("mime_detected"),
        F.when(F.col("event_id") % 13 == 0, F.lit("xx"))
        .otherwise(F.floor(F.col("value") * 1000).cast("string")).alias("length"),
        F.date_format("ts", "yyyyMMddHHmmss").alias("timestamp"),
    )


_EV_CDX_SQL = f"""
SELECT event_id,
       {_EV_URL_SQL} AS url,
       CASE WHEN event_id % 10 < 8 THEN '200'
            WHEN event_id % 10 = 8 THEN '404' ELSE '301' END AS status,
       CASE WHEN event_id % 7 = 0 THEN 'application/pdf'
            WHEN event_id % 7 = 1 THEN NULL ELSE 'text/html' END AS mime_detected,
       CASE WHEN event_id % 13 = 0 THEN 'xx'
            ELSE CAST(CAST(floor(value * 1000) AS BIGINT) AS VARCHAR) END AS length,
       strftime(ts, '%Y%m%d%H%M%S') AS "timestamp"
FROM events
"""

# the reference's choose_better_record fold (download_and_merge.py:198-209)
_FOLD_SQL = """
list_reduce(rs, (acc, x) -> CASE
  WHEN acc['status'] <> '200' AND x['status'] = '200' THEN x
  WHEN acc['status'] = '200' AND x['status'] <> '200' THEN acc
  WHEN contains(lower(coalesce(acc['mime_detected'], '')), 'html')
       AND NOT contains(lower(coalesce(x['mime_detected'], '')), 'html') THEN acc
  WHEN NOT contains(lower(coalesce(acc['mime_detected'], '')), 'html')
       AND contains(lower(coalesce(x['mime_detected'], '')), 'html') THEN x
  WHEN try_cast(coalesce(x['length'], '0') AS BIGINT) IS NOT NULL
       AND try_cast(coalesce(acc['length'], '0') AS BIGINT) IS NOT NULL
       AND try_cast(coalesce(x['length'], '0') AS BIGINT)
           > try_cast(coalesce(acc['length'], '0') AS BIGINT) THEN x
  WHEN coalesce(x['timestamp'], '') > coalesce(acc['timestamp'], '') THEN x
  ELSE acc END)
"""


def _docs2_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents doubled: ids shifted by 1e6, text perturbed with a suffix —
    deterministic near-duplicates for the dedup operators."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return d.unionByName(dup)


_DOCS2_SQL = (
    "(SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 1000000, text || ' zz' FROM documents)"
)


def _docs_dup_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents doubled with IDENTICAL text — exact-duplicate fixture."""
    d = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionByName(
        d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    )


_DOCS_DUP_SQL = (
    "(SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 1000000, text FROM documents)"
)


def _sql_simhash(toks: str) -> str:
    hs = f"list_transform({toks}, t -> ('0x' || substring(md5(t), 1, 8))::BIGINT)"
    terms = []
    for i in range(SIM_BITS):
        vote = (
            f"list_reduce(list_transform(hs, v -> ((v >> {i}) & 1) * 2 - 1), "
            f"(a, b) -> a + b)"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << i} ELSE 0 END)")
    return (
        f"(SELECT CASE WHEN hs IS NULL THEN NULL "
        f"WHEN len(hs) = 0 THEN 0 ELSE {' + '.join(terms)} END "
        f"FROM (SELECT {hs} AS hs) _sh)"
    )


def _sql_segment_ctes(src: str) -> str:
    """Segment-dedup CTE chain (10-word segments, keep-first) over any
    relation exposing (doc_id, text); final relation is ``segfinal``.
    Mirrors ``text_dedup.dedup_segments``: 1-based inclusive list slice
    == Spark's slice; row_number over the fingerprint ordered by
    (doc_id, pos) == Spark's min(struct(id, pos))."""
    return f"""
        words AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM {src}
        ),
        segbase AS (
          SELECT doc_id, CAST(ceil(len(w) / 10.0) AS INT) AS n_segments, w
          FROM words
        ),
        numbered AS (
          SELECT doc_id, w, unnest(range(n_segments)) AS i FROM segbase
        ),
        segs AS (
          SELECT doc_id, CAST(i AS INT) AS pos,
                 array_to_string(w[i*10+1 : i*10+10], ' ') AS segment
          FROM numbered
        ),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY md5(segment) ORDER BY doc_id, pos) AS rn
          FROM segs
        ),
        rebuilt AS (
          SELECT doc_id, string_agg(segment, ' ' ORDER BY pos) AS text,
                 count(*) AS n_kept
          FROM ranked WHERE rn = 1 GROUP BY doc_id
        ),
        segfinal AS (
          SELECT b.doc_id, coalesce(r.text, '') AS text, b.n_segments,
                 CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
          FROM segbase b LEFT JOIN rebuilt r USING (doc_id)
        )
    """


def _sql_minhash_sigs() -> str:
    """sig_0..sig_15 select-list fragment over a CTE exposing ``sh``."""
    sigs = []
    for j in range(NUM_HASHES):
        sigs.append(
            f"CASE WHEN len(sh) = 0 THEN repeat('z', 32) ELSE "
            f"list_aggregate(list_transform(sh, s -> md5(s || '#{j}')), 'min') "
            f"END AS s{j}"
        )
    return ", ".join(sigs)


_SQL_DOT = (
    "list_reduce(list_transform(range(1, 65), i -> {a}[i] * {b}[i]), "
    "(x, y) -> x + y)"
)

# squared-L2 left fold over an n-dim slice — the PQ subspace metric;
# list_reduce seeds with the first element, Spark's aggregate with 0.0:
# 0.0 + v1 == v1 exactly, so both are the same left-associated sum
_SQL_L2 = (
    "list_reduce(list_transform(range(1, {n}), "
    "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
)


def _sql_cosine(a: str, b: str) -> str:
    dot = _SQL_DOT.format(a=a, b=b)
    na = _SQL_DOT.format(a=a, b=a)
    nb = _SQL_DOT.format(a=b, b=b)
    return f"round({dot} / (sqrt({na}) * sqrt({nb})), 6)"


def _sql_bpe_chain(n_merges: int) -> str:
    """Unrolled BPE training as CTEs (the _sql_kmeans_ivf pattern): one
    (pair count, argmax, merge fold) triple per iteration. The merge
    fold is DuckDB's list_reduce over singleton-wrapped symbols — the
    accumulator list grows/fuses exactly like the Spark fold in
    operators/bpe.py (LTR greedy; a just-fused symbol never
    re-triggers because left || right != left)."""
    toks = _SQL_TOKS.format(t="text")
    parts = [f"""hist AS (
          SELECT x AS word, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest({toks}) AS x FROM documents)
          GROUP BY x),
        w0 AS (
          SELECT word, freq,
                 list_append(list_transform(range(1, length(word) + 1),
                                            i -> word[i]), '</w>') AS syms
          FROM hist)"""]
    for k in range(1, n_merges + 1):
        parts.append(f"""p{k} AS (
          SELECT pr.s1 AS s1, pr.s2 AS s2, CAST(sum(freq) AS BIGINT) AS pf
          FROM (SELECT freq,
                       unnest(list_transform(range(1, len(syms)),
                         i -> struct_pack(s1 := syms[i],
                                          s2 := syms[i + 1]))) AS pr
                FROM w{k - 1} WHERE len(syms) > 1)
          GROUP BY 1, 2),
        b{k} AS (SELECT s1, s2, pf FROM p{k}
                 ORDER BY pf DESC, s1 ASC, s2 ASC LIMIT 1),
        w{k} AS (
          SELECT word, freq,
                 list_reduce(list_transform(syms, s -> [s]),
                   (acc, x) -> CASE
                     WHEN len(acc) > 0 AND acc[-1] = b.s1 AND x[1] = b.s2
                     THEN list_append(acc[1:len(acc) - 1], b.s1 || b.s2)
                     ELSE list_append(acc, x[1]) END) AS syms
          FROM w{k - 1} CROSS JOIN b{k} b)""")
    return ",\n        ".join(parts)


def _sql_bpe_encode_expr(n_merges: int, word_var: str = "wv") -> str:
    """BPE-encode one word (lambda var ``word_var``) with the merges
    learned by the b1..bN CTEs of _sql_bpe_chain — one nested
    list_reduce per merge, unique lambda names per level; requires the
    caller to CROSS JOIN b{k} AS m{k} for every k."""
    enc = (f"list_append(list_transform(range(1, length({word_var}) + 1), "
           f"ci -> {word_var}[ci]), '</w>')")
    for k in range(1, n_merges + 1):
        enc = f"""list_reduce(list_transform({enc}, s{k} -> [s{k}]),
        (a{k}, x{k}) -> CASE
          WHEN len(a{k}) > 0 AND a{k}[-1] = m{k}.s1 AND x{k}[1] = m{k}.s2
          THEN list_append(a{k}[1:len(a{k}) - 1], m{k}.s1 || m{k}.s2)
          ELSE list_append(a{k}, x{k}[1]) END)"""
    return enc


def _sql_kmeans_ivf(k: int, n_iters: int, n_probe: int,
                    topn: int, n_q: int) -> str:
    """DuckDB replay of kmeans_centroids + ivf_topk. Trainable because
    the Spark side is deterministic by construction (similarity.py):
    init = K smallest md5(id); assignment orders by the 6dp-rounded
    cosine with cell tie-break; the mean quantizes components to 1e-6,
    sums INTEGERS (associative — no float-order dependence), divides
    back in double and rounds to 6dp. Every iteration unrolls to one
    assign/means/union CTE triple with the identical arithmetic."""

    def _assign(src: str, dst: str, extra: str = "") -> str:
        return f"""{dst} AS (
          SELECT vec_id, v, cell FROM (
            SELECT c.vec_id, c.v, p.cell,
                   row_number() OVER (PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "p.v")} DESC, p.cell)
                     AS rn
            FROM c CROSS JOIN {src} p{extra}) WHERE rn = 1)"""

    ctes = [
        "c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""cents0 AS (
          SELECT CAST(rn - 1 AS INT) AS cell, v FROM (
            SELECT v, row_number() OVER (
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
            FROM c) WHERE rn <= {k})""",
    ]
    for i in range(1, n_iters + 1):
        ctes.append(_assign(f"cents{i - 1}", f"assign{i}"))
        ctes.append(f"""means{i} AS (
          SELECT cell, array_agg(m ORDER BY pos) AS v FROM (
            SELECT cell, pos,
                   round(CAST(sum(CAST(round(val * 1000000.0) AS BIGINT))
                              AS DOUBLE)
                         / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS m
            FROM (SELECT cell, unnest(v) AS val,
                         unnest(range(1, len(v) + 1)) AS pos
                  FROM assign{i})
            GROUP BY cell, pos)
          GROUP BY cell)""")
        ctes.append(f"""cents{i} AS (
          SELECT cell, v FROM means{i}
          UNION ALL
          SELECT cell, v FROM cents{i - 1}
          WHERE cell NOT IN (SELECT cell FROM means{i}))""")
    fin = f"cents{n_iters}"
    ctes.append(_assign(fin, "cells"))
    ctes.append(f"""probes AS (
          SELECT vec_id AS query_id, v AS qv, cell FROM (
            SELECT c.vec_id, c.v, p.cell,
                   row_number() OVER (PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "p.v")} DESC, p.cell)
                     AS rn
            FROM c CROSS JOIN {fin} p WHERE c.vec_id < {n_q})
          WHERE rn <= {n_probe})""")
    cte_block = ",\n        ".join(ctes)
    return f"""
        WITH {cte_block}
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT p.query_id, n.vec_id AS neighbor_id,
                 {_sql_cosine("p.qv", "n.v")} AS cosine,
                 row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY {_sql_cosine("p.qv", "n.v")} DESC, n.vec_id)
                   AS rank
          FROM probes p JOIN cells n ON p.cell = n.cell
          WHERE n.vec_id <> p.query_id)
        WHERE rank <= {topn}
    """


# ---------------------------------------------------------------------------
# entry: flagship crawl pipeline over documents-derived pages
# ---------------------------------------------------------------------------

def _entry_pages_cdx(spark: SparkSession, sf_dir: str):
    """Distributed lift of the documents table into the engine's input
    shape (pages + CDX captures) — pure Catalyst expressions end to end,
    replacing the round-1 driver-side ``toPandas()`` builder (VERDICT r01
    "What's wrong" #1): corpus size is bounded by the cluster, never the
    driver. Every byte is a deterministic expression of
    doc_id/text/lang/source, so DuckDB can reproduce the full pipeline
    output (see ``oracle_sql()['crawl_pipeline']``)."""
    from commoncrawl_spark.fixtures import AUTHORS, CRAWLS

    d = _read(spark, sf_dir, "documents").select("doc_id", "text", "lang", "source")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".news.test/"),
        F.col("lang"), F.lit("/"), i.cast("string"), F.lit("/story"),
    )
    title = F.concat(F.lit("Doc "), i.cast("string"), F.lit(" report"))
    pub = F.format_string(
        "%04d-%02d-%02dT%02d:00:00+00:00",
        (F.lit(2019) + i % 7).cast("int"), (i % 12 + 1).cast("int"),
        (i % 28 + 1).cast("int"), (i % 24).cast("int"),
    )
    author = F.element_at(
        F.array(*[F.lit(a) for a in AUTHORS]), (i % 10 + 1).cast("int")
    )
    # Guardian-selector HTML in WARC framing (3-part \r\n\r\n layout the
    # extractor splits; charset declared so the sniff chain is exercised)
    html = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
        F.lit("\r\n\r\nHTTP/1.1 200 OK\r\nContent-Type: text/html; "
              "charset=utf-8\r\n\r\n"),
        F.lit('<!DOCTYPE html><html><body><h1 class="content__headline">'),
        title,
        F.lit('</h1><time itemprop="datePublished" datetime="'), pub,
        F.lit('">'), pub,
        F.lit('</time><a rel="author" href="/p/'), i.cast("string"),
        F.lit('">'), author,
        F.lit('</a><div itemprop="articleBody"><p>'), F.col("text"),
        F.lit("</p></div></body></html>"),
    )
    pages = d.select(url.alias("url"), F.encode(html, "utf-8").alias("html"))
    # 1-3 captures per URL with varying status/mime/length/timestamp so the
    # choose_better_record fold and the 200 gate are genuinely exercised
    cap = d.select(
        "doc_id", url.alias("url"),
        F.explode(F.sequence(F.lit(0), i % 3)).alias("c"),
    )
    crawl_arr = F.array(*[F.lit(c) for c in CRAWLS])
    j, c = F.col("doc_id"), F.col("c")
    cdx = cap.select(
        "url",
        F.element_at(crawl_arr, ((j + c) % len(CRAWLS) + 1).cast("int")).alias("crawl"),
        (j % 10).cast("int").alias("page"),
        (j * 3 + c).cast("int").alias("line_no"),
        F.when((j + c) % 11 == 0, F.lit("404")).otherwise(F.lit("200")).alias("status"),
        F.when((j + c) % 7 == 0, F.lit("application/pdf"))
        .otherwise(F.lit("text/html")).alias("mime_detected"),
        ((j * 7919 + c * 104729) % 80000 + 2000).cast("string").alias("length"),
        F.concat(F.lit("2024"),
                 F.lpad(((j + c) % 12 + 1).cast("string"), 2, "0"),
                 F.lit("01000000")).alias("timestamp"),
    )
    return pages, cdx


def _crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from commoncrawl_spark.operators.extraction import extract_articles, split_articles

    pages, cdx = _entry_pages_cdx(spark, sf_dir)
    best = best_capture_per_url(cdx, arrival_cols=("crawl", "page", "line_no"))
    fetch = (
        best.filter(F.col("status") == "200")
        .select("url")
        .join(pages.select("url", "html"), "url")
    )
    ok, _failed = split_articles(extract_articles(fetch))
    return ok.select("id", "url", "title", "publish_time", "author", "text")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _crawl_pipeline(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- crawl-core operators (SURVEY.md §2.2-2.5) ----

    def url_canonicalize(spark, sf):
        d = _read(spark, sf, "documents")
        url = F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".org/Docs/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?ref=feed"))
            .otherwise(F.lit("#frag")),
        )
        return d.select(
            "doc_id", canonicalize_url_col(url).alias("canon_url")
        )
    q["url_canonicalize"] = url_canonicalize

    def url_feature_signals(spark, sf):
        """URL structure signals for frontier prioritization (FineWeb-
        style URL heuristics): depth, params, homepage flag, digit
        ratio — over a synthesized URL mix exercising every shape
        (homepage / deep+digits / parameterized / trailing slash)."""
        from commoncrawl_spark.functions.urls import url_features

        d = _read(spark, sf, "documents")
        url = F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".org"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(""))
            .when(F.col("doc_id") % 4 == 1, F.concat(
                F.lit("/a/b/c/page"), F.col("doc_id").cast("string")))
            .when(F.col("doc_id") % 4 == 2, F.concat(
                F.lit("/item?id="), F.col("doc_id").cast("string"),
                F.lit("&ref=feed&x=1")))
            .otherwise(F.concat(
                F.lit("/p"), (F.col("doc_id") % 7).cast("string"),
                F.lit("/"))),
        )
        f = url_features(url)
        return d.select("doc_id", *[v.alias(k) for k, v in f.items()])
    q["url_features"] = url_feature_signals

    def host_traps(spark, sf):
        """Crawler-trap detection over a synthesized URL mix: one
        generated-URL-space host (trap.test — every doc contributes a
        distinct calendar/session URL collapsing to ONE template) plus
        the source hosts (lettered paths: template count tracks URL
        count). The trap host must surface with trap_score near 1."""
        from commoncrawl_spark.operators.links import host_trap_stats

        d = _read(spark, sf, "documents")
        did = F.col("doc_id")
        trap = d.select(F.concat(
            F.lit("https://trap.test/cal/"), did.cast("string"),
            F.lit("?session="), (did * 7).cast("string"),
            F.lit("&page="), (did % 9).cast("string")).alias("url"))
        normal = d.select(F.concat(
            F.lit("https://"), F.col("source"), F.lit(".org/page-"),
            F.lit("abcdefg").substr(
                (did % 7 + 1).cast("int"), F.lit(1))).alias("url"))
        return host_trap_stats(trap.unionByName(normal), min_urls=5)
    q["host_traps"] = host_traps

    def best_capture_dedup(spark, sf):
        cdx = _events_cdx(spark, sf)
        w = best_capture_per_url(cdx, arrival_cols=("event_id",))
        return w.select(
            "canon_url",
            F.col("event_id").alias("w_event_id"),
            F.col("status").alias("w_status"),
            F.col("length").alias("w_length"),
            F.col("timestamp").alias("w_timestamp"),
        )
    q["best_capture_dedup"] = best_capture_dedup

    def incremental_merge(spark, sf):
        """A4: out-of-core batched dedup — fold a new arrival-suffix batch
        into an already-deduped prefix (main_merge_and_deduplicate.py's
        100-file rounds). Because choose_better_record is a LEFT fold and
        batches are arrival-order prefixes, incremental == one global
        fold, which is exactly what the oracle computes."""
        from commoncrawl_spark.operators.dedup import merge_incremental

        cdx = _events_cdx(spark, sf)
        half = F.col("event_id") < 5000
        existing = best_capture_per_url(cdx.filter(half),
                                        arrival_cols=("event_id",))
        merged = merge_incremental(
            existing.drop("canon_url"), cdx.filter(~half),
            arrival_cols=("event_id",),
        )
        return merged.select(
            "canon_url",
            F.col("event_id").alias("w_event_id"),
            F.col("status").alias("w_status"),
            F.col("length").alias("w_length"),
            F.col("timestamp").alias("w_timestamp"),
        )
    q["incremental_merge"] = incremental_merge

    def seen_anti_join(spark, sf):
        cand = _read(spark, sf, "orders").select("o_orderkey")
        seen = _read(spark, sf, "lineitem").select(
            F.col("l_orderkey").alias("o_orderkey")
        )
        return anti_join_seen(cand, seen, key="o_orderkey")
    q["seen_anti_join"] = seen_anti_join

    def bloom_anti_join(spark, sf):
        # crawl-shaped membership: ~3/4 of the candidates are UNSEEN (the
        # common case the Bloom prefilter exists for — definitely-new URLs
        # never reach the exact anti-join shuffle); the seen set is the
        # md5-derived quarter of lineitem keys so DuckDB reproduces it
        key = F.sha1(F.col("o_orderkey").cast("string")).alias("url_sha1")
        cand = _read(spark, sf, "orders").select("o_orderkey", key)
        seen = (
            _read(spark, sf, "lineitem")
            .select(F.col("l_orderkey").alias("o_orderkey"))
            .filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
                    < "4")
            .distinct().select("o_orderkey", key)
        )
        out = anti_join_seen_scalable(cand, seen.select("url_sha1"), n_buckets=16)
        return out.select("o_orderkey")
    q["bloom_anti_join"] = bloom_anti_join

    def cuckoo_anti_join(spark, sf):
        """The cuckoo-filter seen set WITH recrawl eviction exercised end
        to end: seed the set, remove() a subset (those URLs become
        crawlable again), then take the exact cuckoo-accelerated
        anti-join. The oracle is membership in (seen MINUS removed) —
        any false negative from the in-place fingerprint deletion, or
        any stale-eviction leak, breaks the hash."""
        from commoncrawl_spark.operators.cuckoo import CuckooSeenSet

        key = F.sha1(F.col("o_orderkey").cast("string")).alias("url_sha1")
        cand = _read(spark, sf, "orders").select("o_orderkey", key)
        first = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
        seen = (
            _read(spark, sf, "lineitem")
            .select(F.col("l_orderkey").alias("o_orderkey"))
            .filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
                    < "4")
            .distinct().select("o_orderkey", key)
        )
        s = CuckooSeenSet(seen.select("url_sha1"), n_buckets=16)
        s.remove(seen.filter(first < "1").select("url_sha1"))
        return s.unseen(cand).select("o_orderkey")
    q["cuckoo_anti_join"] = cuckoo_anti_join

    def politeness_schedule(spark, sf):
        ev = _read(spark, sf, "events").select(
            "event_id", "ts",
            F.concat(F.lit("site-"), (F.col("user_id") % 37).cast("string"))
            .alias("host"),
        )
        out = select_polite_batch(
            ev, budget_per_host=5, salt_buckets=8,
            priority_cols=("ts", "event_id"), key_col="event_id",
        )
        return out.select("host", "host_rank", "event_id")
    q["politeness_schedule"] = politeness_schedule

    def politeness_delay_schedule(spark, sf):
        """W5 with robots crawl-delay-derived budgets: a host's per-round
        budget is min(global cap, floor(round_seconds / delay)) — the
        reference's time.sleep pacing generalized per host."""
        ev = _read(spark, sf, "events").select(
            "event_id", "ts",
            F.concat(F.lit("site-"), (F.col("user_id") % 23).cast("string"))
            .alias("host"),
            # deterministic per-host crawl delay: 1..3 s; 10 s rounds
            F.floor(F.lit(10.0) / (F.col("user_id") % 23 % 3 + 1))
            .cast("int").alias("_budget"),
        )
        out = select_polite_batch(
            ev, budget_per_host=6, salt_buckets=8,
            priority_cols=("ts", "event_id"), key_col="event_id",
            budget_col="_budget",
        )
        return out.select("host", "host_rank", "event_id")
    q["politeness_delay_schedule"] = politeness_delay_schedule

    def crawl_budget_q(spark, sf):
        """Per-host round quotas: global budget 300 split by expected
        value (mean quality x sum p_changed), clamped by the robots
        crawl-delay ceiling (1800 s round / delay) and pending count —
        the budget_col feeding select_polite_batch. Delays cycle
        0/15/30/45 s by source index so every clamp path is exercised
        (0 -> uncapped NULL, 45 -> cap 40 below some shares)."""
        from commoncrawl_spark.operators.schedule import crawl_budget

        d = _read(spark, sf, "documents")
        host = F.concat(F.col("source"), F.lit(".test"))
        frontier = d.select(
            host.alias("host"),
            ((F.col("doc_id") % 11) / F.lit(10.0)).alias("p_changed"),
            ((F.col("doc_id") % 7) / F.lit(7.0)).alias("q"),
        )
        robots = d.select(
            host.alias("host"),
            (F.regexp_extract("source", r"(\d+)", 1).cast("int")
             % 4 * 15).cast("double").alias("crawl_delay_s"),
        ).distinct()
        return crawl_budget(
            frontier, total_budget=300, round_seconds=1800.0,
            robots=robots, quality_col="q")
    q["crawl_budget"] = crawl_budget_q

    # ---- analytics (SURVEY.md §2.3 A7-A11, F5) ----

    def word_topk(spark, sf):
        d = _read(spark, sf, "documents")
        return explode_count(d, tokens_col(F.col("text")), out="word", top_n=20)
    q["word_topk"] = word_topk

    def year_hist(spark, sf):
        return year_histogram(_read(spark, sf, "events"), "ts")
    q["year_histogram"] = year_hist

    def hour_hist(spark, sf):
        ev = _read(spark, sf, "events")
        return (
            ev.select(F.hour("ts").alias("hour"))
            .groupBy("hour").agg(F.count("*").alias("cnt")).orderBy("hour")
        )
    q["hour_histogram"] = hour_hist

    def top_users(spark, sf):
        return top_k(_read(spark, sf, "events"), "user_id", k=10)
    q["top_users"] = top_users

    def key_skew(spark, sf):
        """Join-key skew diagnostic: the 20 heaviest event user_ids
        with row counts and share of total — the measurement behind
        salting / AQE-skew / broadcast decisions. TakeOrderedAndProject
        top-k; rank derives window-free from the bounded survivors."""
        from commoncrawl_spark.operators.analytics import (
            key_skew_profile,
        )

        return key_skew_profile(
            _read(spark, sf, "events"), "user_id", top_k=20)
    q["key_skew"] = key_skew

    def value_percentiles(spark, sf):
        # exact=True: this query IS the oracle comparison; the default
        # (and the _approx twin below) is the bounded-memory sketch path
        return describe_numeric(_read(spark, sf, "events"), "value", exact=True)
    q["value_percentiles"] = value_percentiles

    def value_percentiles_approx(spark, sf):
        # the scale default — sketch quantiles; no SQL oracle (DuckDB's
        # interpolating quantile_cont is a different estimator), so the
        # driver records rows-only and pytest pins a tolerance bound vs
        # the exact path (tests/test_analytics.py)
        return describe_numeric(_read(spark, sf, "events"), "value")
    q["value_percentiles_approx"] = value_percentiles_approx

    def kw_filter(spark, sf):
        d = _read(spark, sf, "documents")
        out = keyword_filter(
            d, F.col("text"), include=["spark", "window"], exclude=["slow", "error"]
        )
        return out.select("doc_id", "pos", "neg")
    q["keyword_filter"] = kw_filter

    def props_json_extract(spark, sf):
        # C12: per-line JSON parse (reference json.loads everywhere)
        ev = _read(spark, sf, "events")
        return ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k"),
        )
    q["props_json_extract"] = props_json_extract

    def deterministic_sample(spark, sf):
        # A11: sampling — hash-based so it is reproducible across engines,
        # partitionings, and cluster sizes (rand(seed) is none of those)
        d = _read(spark, sf, "documents")
        return d.select("doc_id").filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "28"
        )
    q["deterministic_sample"] = deterministic_sample

    def stratified_sample_q(spark, sf):
        """Per-stratum deterministic sample under sqrt allocation: the
        language strata are skewed (en ~3.4x fr at sf0.01), so
        proportional sampling would crowd out the tail and equal
        sampling would over-represent it; sqrt quotas split the
        difference. The pick inside each stratum is the quota-many
        smallest md5(seed||doc_id) — a pure function of the data."""
        from commoncrawl_spark.operators.analytics import (
            sqrt_allocation, stratified_sample)

        d = _read(spark, sf, "documents").select("doc_id", "lang")
        quotas = sqrt_allocation(d, "lang", total_n=100)
        return stratified_sample(
            d, "lang", quotas, key_cols=("doc_id",), seed=42)
    q["stratified_sample"] = stratified_sample_q

    # ---- text analysis ----

    def language_id(spark, sf):
        d = _read(spark, sf, "documents")
        return d.select("doc_id", language_id_col(F.col("text")).alias("pred_lang"))
    q["language_id"] = language_id

    def token_counts(spark, sf):
        d = _read(spark, sf, "documents")
        return d.select(
            "doc_id",
            token_count_col(F.col("text")).alias("ws_tokens"),
            bpe_token_count_col(F.col("text")).alias("bpe_tokens"),
        )
    q["token_counts"] = token_counts

    def bpe_merges(spark, sf):
        # distributed BPE vocabulary training (Sennrich et al. 2016)
        # over the word histogram: the corpus is tokenized ONCE; each
        # merge iteration runs on the vocab-sized table. Deterministic
        # tie-breaks (freq desc, left asc, right asc) — the oracle
        # replays training via unrolled CTEs (_sql_bpe_chain).
        from commoncrawl_spark.operators.bpe import bpe_train, merges_table

        d = _read(spark, sf, "documents")
        return merges_table(spark, bpe_train(d, n_merges=6))
    q["bpe_merges"] = bpe_merges

    def bpe_tokens(spark, sf):
        # train-then-encode: the learned merges applied per word as a
        # Catalyst fold chain (bpe_encode_col; the pandas-UDF twin
        # bpe_encode_udf is for production vocab sizes)
        from commoncrawl_spark.operators.bpe import bpe_encode_col, bpe_train

        d = _read(spark, sf, "documents")
        merges = bpe_train(d, n_merges=6)
        # bind the fold chain to a real column so size/concat_ws do not
        # each re-evaluate the 6-merge encode
        t = d.select(
            "doc_id", bpe_encode_col(F.col("text"), merges).alias("_toks"))
        return t.select(
            "doc_id",
            F.size("_toks").cast("long").alias("n_bpe"),
            F.concat_ws(" ", "_toks").alias("bpe_text"),
        )
    q["bpe_tokens"] = bpe_tokens

    def quality_scores(spark, sf):
        d = _read(spark, sf, "documents")
        f = quality_features(F.col("text"))
        return d.select(
            "doc_id",
            f["n_tokens"].alias("n_tokens"),
            f["punct_ratio"].alias("punct_ratio"),
            f["stopword_ratio"].alias("stopword_ratio"),
            quality_score_col(F.col("text")).alias("quality"),
        )
    q["quality_scores"] = quality_scores

    def doc_fingerprint(spark, sf):
        d = _read(spark, sf, "documents")
        return d.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))
    q["doc_fingerprint"] = doc_fingerprint

    def gopher_quality(spark, sf):
        """Gopher-style repetition/boilerplate filter (Rae et al. 2021)
        over a deterministic multi-line rendering of each document (the
        synthetic corpus is single-line, so the query appends substring
        lines — duplicated on doc_id % 3, a bullet on % 4, an ellipsis
        on % 5 — exercising every line-level signal both ways)."""
        from commoncrawl_spark.functions.text import (
            gopher_keep_col,
            repetition_signals,
        )

        d = _read(spark, sf, "documents")
        l2 = F.substring(F.col("text"), 1, 40)
        l3 = F.when(F.col("doc_id") % 3 == 0, l2).otherwise(
            F.substring(F.col("text"), 41, 40))
        l4 = F.when(F.col("doc_id") % 4 == 0, F.lit("- bullet item")
                    ).otherwise(F.lit("plain tail line"))
        l5 = F.when(F.col("doc_id") % 5 == 0, F.lit("to be continued...")
                    ).otherwise(F.lit("the end"))
        mtext = F.concat_ws("\n", F.col("text"), l2, l3, l4, l5)
        r = repetition_signals(mtext)
        return d.select(
            "doc_id",
            r["n_lines"].alias("n_lines"),
            r["n_words"].alias("n_words"),
            r["mean_word_len"].alias("mean_word_len"),
            r["dup_line_frac"].alias("dup_line_frac"),
            r["dup_line_char_frac"].alias("dup_line_char_frac"),
            r["bullet_line_frac"].alias("bullet_line_frac"),
            r["ellipsis_line_frac"].alias("ellipsis_line_frac"),
            r["symbol_word_ratio"].alias("symbol_word_ratio"),
            r["alpha_word_frac"].alias("alpha_word_frac"),
            gopher_keep_col(mtext).alias("keep"),
        )
    q["gopher_quality"] = gopher_quality

    def gopher_repetition(spark, sf):
        # Gopher's n-gram repetition filters (Rae et al. 2021 Table A1):
        # top-{2,3,4}-gram character mass + duplicated-{5..10}-gram
        # word-mass union, with the published removal thresholds
        from commoncrawl_spark.operators.text_dedup import (
            gopher_ngram_stats,
        )

        d = _read(spark, sf, "documents")
        return gopher_ngram_stats(d)
    q["gopher_repetition"] = gopher_repetition

    def filtering_pipeline(spark, sf):
        """The heuristic+model FILTER family composed in curation order
        (the complement of selection_pipeline's selection family):
        Gopher line rules (word bounds tuned to corpus units) ->
        Gopher n-gram repetition gate -> NB model gate (trained on
        the full corpus's 80% md5 split, label lang='en' — the
        CCNet-style keep-target-language stage; keep
        classifier-positive survivors) -> exact dedup (min-id per
        fingerprint). Zero Python anywhere — the NB model rides a
        broadcast join, the gates are scan-stage expressions plus the
        repetition family's three slim exchanges."""
        from commoncrawl_spark.functions.text import gopher_keep_col
        from commoncrawl_spark.operators.classify import (
            nb_classify,
            nb_train,
        )
        from commoncrawl_spark.operators.text_dedup import (
            drop_exact_duplicates,
            gopher_ngram_stats,
        )

        d = _read(spark, sf, "documents")
        a = d.where(gopher_keep_col(F.col("text"), min_words=30))
        repk = (
            gopher_ngram_stats(a)
            .where(F.col("repetition_keep")).select("doc_id"))
        b = a.join(repk, "doc_id", "left_semi")
        bucket = (
            F.conv(F.substring(
                F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 5
        )
        train = d.select(
            "doc_id", "text", (F.col("lang") == "en").alias("label"),
        ).where(bucket < 4)
        model, priors = nb_train(train)
        scored = nb_classify(
            b.select("doc_id", "text"), model, priors)
        c = (
            b.join(scored.where(F.col("pred"))
                   .select("doc_id", "score"), "doc_id")
        )
        kept = drop_exact_duplicates(c)
        return kept.select("doc_id", "lang", F.col("score"))
    q["filtering_pipeline"] = filtering_pipeline

    def asof_capture(spark, sf):
        """Backward-inclusive as-of join: each click event gains the
        latest prior-or-equal view by the same user — the 'which capture
        was current at fetch time' shape. Union-merge plan: one exchange
        per side, one sort, running last(ignorenulls) — no Python, no
        cartesian. Oracle is DuckDB's native ASOF LEFT JOIN."""
        from commoncrawl_spark.operators.temporal import asof_join

        ev = _read(spark, sf, "events")
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts")
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "value")
        return asof_join(clicks, views, on="user_id")
    q["asof_capture"] = asof_capture

    def capture_time_travel(spark, sf):
        """latest_as_of over the synthetic CDX log: the newest capture
        per URL as of a cutoff — best_capture's T-bounded generalization
        (T = +inf reproduces the reference's whole-log fold)."""
        from commoncrawl_spark.operators.temporal import latest_as_of

        cdx = _events_cdx(spark, sf)
        return latest_as_of(
            cdx, "20240105000000", key_col="url", ts_col="timestamp",
            tiebreak_cols=("event_id",),
        )
    q["capture_time_travel"] = capture_time_travel

    def sessionization(spark, sf):
        """Gap-based sessionization of the event stream: a new session per
        user whenever >6h elapse since their previous event. For a crawl
        this is fetch-burst segmentation per host. One hash exchange +
        per-partition sort (lag + running sum) — no Python; gap compared
        at microsecond precision so the boundary cuts identically in any
        SQL engine."""
        from commoncrawl_spark.operators.temporal import sessionize

        ev = _read(spark, sf, "events").select("event_id", "user_id", "ts")
        return sessionize(ev, key_col="user_id", ts_col="ts",
                          gap_seconds=21600)
    q["sessionization"] = sessionization

    def stream_sessionize(spark, sf):
        """The STREAMING stateful twin as a real stream — the driver row
        for the Structured Streaming surface (batch parity is also
        pytest-pinned): events split into two event-time-ordered
        micro-batch files, fed through readStream + maxFilesPerTrigger=1
        + applyInPandasWithState (per-key (ordinal, last_ts) state
        crossing the batch boundary via the state store) + availableNow
        + a memory sink. Session ids equal the batch operator's, so the
        batch SQL is the oracle."""
        import os
        import tempfile
        import uuid

        from commoncrawl_spark.streaming.stateful import (
            streaming_sessionize,
        )

        # parquet ts is TIMESTAMP_NTZ: micros via timestamp_diff from the
        # naive epoch — timezone-free, exactly DuckDB's epoch_us(ts)
        epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ev = _read(spark, sf, "events").select(
            F.col("user_id").cast("string").alias("key"),
            F.timestamp_diff("MICROSECOND", epoch, F.col("ts"))
            .alias("ts_micros"),
        )
        d = tempfile.mkdtemp(prefix="ccs_stream_sess_")
        src = os.path.join(d, "src")
        lo, hi = ev.agg(F.min("ts_micros"), F.max("ts_micros")).first()
        mid = (int(lo) + int(hi)) // 2
        # batch 0 = first half of event time, batch 1 = second half:
        # per key, everything in batch 0 precedes batch 1 — the ordered
        # arrival the state contract requires. Explicit mtimes pin the
        # file-source processing order (it sorts by modification time).
        for i, part in enumerate([
            ev.filter(F.col("ts_micros") <= mid),
            ev.filter(F.col("ts_micros") > mid),
        ]):
            bdir = os.path.join(src, f"b{i}")
            part.coalesce(1).write.parquet(bdir)
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    os.utime(os.path.join(bdir, f), (1000 + i, 1000 + i))
        stream = (
            spark.readStream.schema("key string, ts_micros long")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        out = streaming_sessionize(stream, gap_seconds=21600)
        name = f"ccs_sessions_{uuid.uuid4().hex[:8]}"
        _await_stream(out.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .outputMode("append").trigger(availableNow=True).start(), 300)
        return spark.table(name).select("key", "ts_micros", "session_id")
    q["stream_sessionize"] = stream_sessionize

    def stream_dedup(spark, sf):
        """The streaming seen-set as a real stream — exact dedup via
        the keyed state store (streaming_first_seen, the A3/A5 twin):
        batch 0 is the corpus, batch 1 REPLAYS the entire corpus, so
        every batch-1 row is a cross-batch duplicate: a stateless
        implementation would emit 2x rows, the state store emits each
        fingerprint exactly once. Output columns are functions of the
        text alone (fp, n_chars), so whichever duplicate row survives
        the result is deterministic and the batch DISTINCT is the
        oracle."""
        import os
        import tempfile
        import uuid

        from commoncrawl_spark.streaming.stateful import (
            streaming_first_seen,
        )

        d0 = _read(spark, sf, "documents").select(
            F.md5(F.col("text")).alias("fp"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        d = tempfile.mkdtemp(prefix="ccs_stream_dedup_")
        src = os.path.join(d, "src")
        for i, part in enumerate([d0, d0]):
            bdir = os.path.join(src, f"b{i}")
            part.coalesce(1).write.parquet(bdir)
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    os.utime(os.path.join(bdir, f), (1000 + i, 1000 + i))
        stream = (
            spark.readStream.schema("fp string, n_chars long")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        out = streaming_first_seen(stream, ["fp"])
        name = f"ccs_dedup_{uuid.uuid4().hex[:8]}"
        _await_stream(out.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .outputMode("append").trigger(availableNow=True).start(), 300)
        return spark.table(name).select("fp", "n_chars")
    q["stream_dedup"] = stream_dedup

    def stream_window_stats(spark, sf):
        """Watermarked tumbling-window aggregation as a REAL stream
        (windowed_fetch_stats, the per-round metrics twin): batch 0 =
        event-time first half, batch 1 = second half, batch 2 REPLAYS
        the earliest fifth — every replayed row is >22000 s older than
        the post-batch-0 watermark (max(ts)-7200), so Structured
        Streaming must DROP it pre-aggregation; append mode then emits
        exactly the windows closed by the final watermark. The oracle
        encodes both rules (drop + close), so the hash proves watermark
        semantics: a stateless engine (replays double-counted) or one
        that emits open windows hash-mismatches."""
        import os
        import tempfile
        import uuid

        from commoncrawl_spark.streaming.pipeline import (
            windowed_fetch_stats,
        )

        ev = _read(spark, sf, "events").select(
            F.concat(F.lit("h"), (F.col("user_id") % 7).cast("string"))
            .alias("host"),
            ((F.col("event_id") * 37) % 100000).alias("ts_sec"),
            F.when(F.col("event_type") == "click", F.lit("200"))
            .otherwise(F.lit("404")).alias("status"),
        )
        d = tempfile.mkdtemp(prefix="ccs_stream_win_")
        src = os.path.join(d, "src")
        for i, part in enumerate([
            ev.filter(F.col("ts_sec") < 50000),
            ev.filter(F.col("ts_sec") >= 50000),
            ev.filter(F.col("ts_sec") < 20000),  # late replay
        ]):
            bdir = os.path.join(src, f"b{i}")
            part.coalesce(1).write.parquet(bdir)
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    os.utime(os.path.join(bdir, f), (1000 + i, 1000 + i))
        stream = (
            spark.readStream
            .schema("host string, ts_sec long, status string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
            .withColumn("event_ts", F.timestamp_seconds(F.col("ts_sec")))
        )
        out = windowed_fetch_stats(
            stream, ts_col="event_ts", window="1 hour",
            watermark="2 hours")
        name = f"ccs_win_{uuid.uuid4().hex[:8]}"
        _await_stream(out.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .outputMode("append").trigger(availableNow=True).start(), 300)
        return spark.table(name).select(
            F.unix_timestamp("window_start").alias("window_start_s"),
            F.unix_timestamp("window_end").alias("window_end_s"),
            "host", "n_fetched", "n_ok",
        )
    q["stream_window_stats"] = stream_window_stats

    def capture_diff(spark, sf):
        """Incremental-recrawl planning: diff the capture log between two
        cutoffs — per URL compare latest-as-of(T_old) vs latest-as-of(
        T_new), classify added/changed/unchanged. Two max_by folds over
        one scan + a full-outer merge on the key; no Python."""
        from commoncrawl_spark.operators.temporal import snapshot_diff

        cdx = _events_cdx(spark, sf)
        return snapshot_diff(
            cdx, "20240103000000", "20240105000000",
            key_col="url", ts_col="timestamp",
            compare_cols=("status", "length"), tiebreak_cols=("event_id",))
    q["capture_diff"] = capture_diff

    def warc_revisit(spark, sf):
        """Digest-based WARC revisit classification (the Common Crawl
        storage saver: unchanged recrawls become pointer records, not
        stored bytes): captures before the cutoff are the prior
        snapshot's stored originals; each current capture is a
        'response' (first time this (url, digest) is seen) or a
        'revisit' referring to the original's timestamp — prior match
        wins, else the batch-earliest (ts, event_id) capture is the
        original. One min(struct) fold + two equi-joins on the
        (url, digest) key; no windows, no Python."""
        from commoncrawl_spark.operators.temporal import revisit_records

        cut = "20240103000000"
        cdx = _events_cdx(spark, sf).withColumn(
            "digest",
            F.md5(F.concat(
                F.col("url"), F.lit(":"),
                (F.col("event_id") % 3).cast("string"))))
        prior = (
            cdx.filter(F.col("timestamp") < cut)
            .groupBy("url", "digest")
            .agg(F.min("timestamp").alias("timestamp"))
        )
        cur = cdx.filter(F.col("timestamp") >= cut)
        return revisit_records(
            cur, prior, tiebreak_cols=("event_id",)
        ).select("event_id", "url", "timestamp", "digest",
                 "record_type", "refers_to_ts")
    q["warc_revisit"] = warc_revisit

    def blocklist_filter(spark, sf):
        """UT1-style domain blocklist over the capture log: hosts explode
        into dot-suffixes and a broadcast equi semi-join finds blocked
        URLs (never a LIKE nested-loop against the list); the kept rows
        come back via one anti-join on the url key."""
        from commoncrawl_spark.operators.blocklist import filter_blocked_hosts

        cdx = _events_cdx(spark, sf).select("event_id", "url", "status")
        bl = spark.createDataFrame(
            [("site-3.test",), ("site-17.test",), ("site-29.test",)],
            "domain string")
        return filter_blocked_hosts(cdx, bl)
    q["blocklist_filter"] = blocklist_filter

    def segment_dedup(spark, sf):
        """Corpus-wide segment-level dedup (CCNet/RefinedWeb line-dedup
        shape, 10-word segments, keep-first): explode is per-row, the
        keep decision shuffles only md5 fingerprints + (id, pos), and
        reassembly is one groupBy on doc_id — two exchanges, no Python."""
        from commoncrawl_spark.operators.text_dedup import dedup_segments

        d = _read(spark, sf, "documents").select("doc_id", "text")
        return dedup_segments(d, seg_words=10, keep="first")
    q["segment_dedup"] = segment_dedup

    def curation_pipeline(spark, sf):
        """Composed training-data curation: language-ID -> quality gate ->
        token-length gate -> exact first-wins dedup by fingerprint. The
        whole pipeline is Catalyst expressions + one min_by shuffle."""
        from commoncrawl_spark.operators.dedup import dedup_first_seen

        d = _read(spark, sf, "documents")
        f = quality_features(F.col("text"))
        scored = d.select(
            "doc_id",
            language_id_col(F.col("text")).alias("pred_lang"),
            f["n_tokens"].alias("n_tokens"),
            quality_score_col(F.col("text")).alias("quality"),
            fingerprint_col(F.col("text")).alias("fingerprint"),
        )
        kept = scored.filter(
            (F.col("pred_lang") == "en")
            & (F.col("quality") >= 0.5)
            & (F.col("n_tokens") >= 10)
        )
        out = dedup_first_seen(kept, ["fingerprint"], ["doc_id"])
        return out.select("doc_id", "pred_lang", "n_tokens", "quality")
    q["curation_pipeline"] = curation_pipeline

    def curation_pipeline_v2(spark, sf):
        """curation_pipeline survivors -> corpus-wide segment dedup over
        the curated subset -> boilerplate-fraction gate (a document must
        keep at least half its segments). The segment stage shuffles only
        md5 fingerprints + (id, pos); the gate is a free post-filter on
        the reassembly aggregate — still zero Python end to end."""
        from commoncrawl_spark.operators.text_dedup import dedup_segments

        d = _read(spark, sf, "documents")
        curated = curation_pipeline(spark, sf).select("doc_id")
        cursrc = d.join(curated, "doc_id").select("doc_id", "text")
        seg = dedup_segments(cursrc, seg_words=10, keep="first")
        return seg.filter(F.col("n_kept") * 2 >= F.col("n_segments"))
    q["curation_pipeline_v2"] = curation_pipeline_v2

    def link_discovery(spark, sf):
        """Synthetic pages (one per document, deterministic hrefs of every
        resolution class) -> extract_links. Oracle derives the expected
        edges from first principles, so any mis-parse or mis-resolution
        breaks the hash."""
        from commoncrawl_spark.operators.links import extract_links

        d = _read(spark, sf, "documents").select("doc_id", "source", "lang")
        src = F.concat(
            F.lit("https://"), F.col("source"), F.lit(".news.test/"),
            F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
            F.lit("/story"),
        )
        html = F.concat(
            F.lit('<html><body><a href="https://ext.test/p/'),
            (F.col("doc_id") % 50).cast("string"), F.lit('">x</a>'),
            F.lit("<a href='/section/"),
            (F.col("doc_id") % 7).cast("string"), F.lit("'>y</a>"),
            F.lit('<a href="rel/'),
            (F.col("doc_id") % 3).cast("string"), F.lit('.html">z</a>'),
            F.lit('<a href="//cdn.test/img/'),
            (F.col("doc_id") % 5).cast("string"), F.lit('">w</a>'),
            F.lit('<a href="mailto:a@b.test">m</a>'),
            F.lit('<a href="#frag">f</a></body></html>'),
        )
        pages = d.select(src.alias("url"), F.encode(html, "utf-8").alias("html"))
        return extract_links(pages).select("src_url", "href", "abs_url")
    q["link_discovery"] = link_discovery

    def pii_redaction(spark, sf):
        """Training-data PII scrub: deterministic emails/IPs/phones are
        planted in every document, then redacted with typed placeholders
        and counted. The oracle re-runs the identical pattern list
        (generated from PII_PATTERNS, so Spark and SQL cannot drift)."""
        from commoncrawl_spark.functions.text import (
            pii_counts_col,
            redact_pii_col,
        )

        d = _read(spark, sf, "documents").select("doc_id", "text")
        pii = F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".test from 10.2."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(".77 call 555-123-4567 or +4930"),
            (F.col("doc_id") % 1000 + 1000).cast("string"),
        )
        c = pii_counts_col(pii)
        return d.select(
            "doc_id",
            redact_pii_col(pii).alias("redacted"),
            c["n_email"].alias("n_email"),
            c["n_ipv4"].alias("n_ipv4"),
            c["n_phone"].alias("n_phone"),
        )
    q["pii_redaction"] = pii_redaction

    def warc_segment_read(spark, sf):
        """Real byte-level WARC framing end to end: documents become
        response records, records become Common-Crawl-shaped segments
        (one gzip member per record, deterministic bytes), and
        read_warc_records splits them back. The oracle recomputes every
        parsed field from the generating parameters — a framing bug
        (wrong Content-Length math, member-boundary drift, header
        mis-parse) breaks the hash."""
        from commoncrawl_spark.sources.warc import (
            make_warc_response,
            make_warc_segment,
            read_warc_records,
        )

        d = _read(spark, sf, "documents").select(
            "doc_id", "text", (F.col("doc_id") % 50).cast("int").alias("seg"))

        def build(pdf):
            import pandas as pd

            pdf = pdf.sort_values("doc_id")
            recs = [
                make_warc_response(f"https://w.test/{i}", t.encode("utf-8"))
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            return pd.DataFrame({
                "seg": [int(pdf["seg"].iloc[0])],
                "segment": [make_warc_segment(recs)],
            })

        segs = d.groupBy("seg").applyInPandas(build, "seg int, segment binary")
        recs = read_warc_records(segs, "segment")
        body = F.regexp_replace(
            F.col("payload").cast("string"), r"(?s)^.*?\r\n\r\n", "")
        return recs.select(
            F.col("target_uri").alias("url"),
            "record_idx",
            "content_length",
            body.alias("body"),
        )
    q["warc_segment_read"] = warc_segment_read

    def warc_cdx(spark, sf):
        """CDX index generation from WARC segments (the indexing side
        of the Common Crawl pipeline — the inverse of the harvest
        path): the same deterministic segments as warc_segment_read,
        re-indexed to (surt, timestamp, url, digest, record_idx,
        payload_length). The oracle recomputes every field from the
        generating parameters (the byte offsets/lengths — gzip member
        sizes no SQL engine can reproduce — are pinned by the
        slice-and-gunzip round-trip test in test_warc.py)."""
        from commoncrawl_spark.sources.warc import (
            make_warc_response,
            make_warc_segment,
            read_warc_records,
            warc_cdx_index,
        )

        d = _read(spark, sf, "documents").select(
            "doc_id", "text", (F.col("doc_id") % 50).cast("int").alias("seg"))

        def build(pdf):
            import pandas as pd

            pdf = pdf.sort_values("doc_id")
            recs = [
                make_warc_response(f"https://w.test/{i}", t.encode("utf-8"))
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            return pd.DataFrame({
                "seg": [int(pdf["seg"].iloc[0])],
                "segment": [make_warc_segment(recs)],
            })

        segs = d.groupBy("seg").applyInPandas(build, "seg int, segment binary")
        cdx = warc_cdx_index(read_warc_records(segs, "segment"), segs)
        return cdx.select(
            "surt", "cdx_ts", "url", "digest", "record_idx",
            "payload_length")
    q["warc_cdx"] = warc_cdx

    def cdx_zipnum(spark, sf):
        """ZipNum cluster.idx derivation — the cc-index secondary index:
        the sorted (surt, ts) CDX stream cut into 16-line blocks, one
        summary row per block (start key, shard = block//4, count).
        Global rank is computed with NO window at all (range partition +
        monotonically_increasing_id + broadcast offset fix-up), so the
        oracle's ROW_NUMBER() is the semantic spec, not the plan."""
        from commoncrawl_spark.tables import zipnum_cluster_idx

        d = _read(spark, sf, "documents")
        cdx = d.select(
            F.concat(F.lit("org,"), F.col("source"), F.lit(")/p"),
                     F.col("doc_id").cast("string")).alias("surt"),
            (F.lit(20200000000000) + F.col("doc_id"))
            .cast("string").alias("cdx_ts"),
        )
        return zipnum_cluster_idx(cdx, lines_per_block=16,
                                  blocks_per_shard=4)
    q["cdx_zipnum"] = cdx_zipnum

    def wet_export(spark, sf):
        """WET conversion-record export, proven by round trip: documents
        -> byte-deterministic *.warc.wet segments (sorted-by-url gzip
        members per shard) -> read BACK through the real WARC reader.
        Every output field crosses the byte framing (headers, lengths,
        payload), so the oracle recomputing them from first principles
        pins the whole serialize->parse loop; the payload digest proves
        the text survived byte-identically."""
        from commoncrawl_spark.sources.warc import (
            read_warc_records,
            wet_segments,
        )

        d = _read(spark, sf, "documents").select(
            F.concat(F.lit("https://w.test/"),
                     F.col("doc_id").cast("string")).alias("url"),
            "text",
            (F.col("doc_id") % 8).cast("int").alias("shard"),
        )
        segs = wet_segments(d)
        recs = read_warc_records(segs, "segment")
        return recs.select(
            "shard", "record_idx",
            F.col("target_uri").alias("url"),
            "warc_type", "content_length",
            F.sha2(F.col("payload"), 256).alias("digest"),
        )
    q["wet_export"] = wet_export

    def warc_export(spark, sf):
        """WARC response-record export, the archive artifact itself —
        closing the WARC/WAT/WET trio: documents -> HTML pages ->
        byte-deterministic *.warc segments (full HTTP response payload,
        sorted-by-url gzip members per shard) -> read BACK through the
        WARC reader. The oracle rebuilds the HTTP block byte-for-byte
        (status line + headers + body) and hashes it, pinning the whole
        serialize->gzip->parse loop."""
        from commoncrawl_spark.sources.warc import (
            read_warc_records,
            warc_segments,
        )

        d = _read(spark, sf, "documents").select(
            F.concat(F.lit("https://wr.test/"),
                     F.col("doc_id").cast("string")).alias("url"),
            F.encode(
                F.concat(F.lit("<html><body>"), F.col("text"),
                         F.lit("</body></html>")), "utf-8").alias("html"),
            (F.col("doc_id") % 8).cast("int").alias("shard"),
        )
        segs = warc_segments(d)
        recs = read_warc_records(segs, "segment")
        return recs.select(
            "shard", "record_idx",
            F.col("target_uri").alias("url"),
            "warc_type", "content_length",
            F.sha2(F.col("payload"), 256).alias("digest"),
        )
    q["warc_export"] = warc_export

    def wat_export(spark, sf):
        """WAT metadata-record export — the third Common Crawl artifact
        next to warc_cdx and wet_export, closing the WARC/WAT/WET trio:
        synthesized pages -> REAL link extraction (the three-regex
        extract_links pass) + title extraction -> canonical envelope
        JSON (pinned concat serialization, not a JSON library) ->
        byte-deterministic *.warc.wat segments -> read BACK through the
        WARC reader. The oracle rebuilds the JSON bytes from the
        generating templates, so the digest pins link extraction,
        absolutization, JSON framing, WARC framing, and the parse —
        end to end."""
        from commoncrawl_spark.operators.links import extract_links
        from commoncrawl_spark.sources.warc import (
            read_warc_records,
            wat_payload_col,
            wat_segments,
        )

        d = _read(spark, sf, "documents").select("doc_id")
        pages = d.select(
            F.concat(F.lit("https://w"),
                     (F.col("doc_id") % 5).cast("string"),
                     F.lit(".test/a/"),
                     F.col("doc_id").cast("string")).alias("url"),
            (F.col("doc_id") % 8).cast("int").alias("shard"),
            F.concat(
                F.lit("<html><head><title>Doc "),
                F.col("doc_id").cast("string"),
                F.lit('</title></head><body><a href="https://x'),
                ((F.col("doc_id") + 1) % 5).cast("string"),
                F.lit(".test/p/"),
                (F.col("doc_id") % 11).cast("string"),
                F.lit('">x</a><a href="/q/'),
                (F.col("doc_id") % 7).cast("string"),
                F.lit('">y</a></body></html>'),
            ).cast("binary").alias("html"),
        )
        links = (
            extract_links(pages, "html", "url")
            .groupBy(F.col("src_url").alias("url"))
            .agg(F.sort_array(F.collect_list("abs_url")).alias("links"))
        )
        payloads = (
            pages.withColumn(
                "title",
                F.regexp_extract(F.col("html").cast("string"),
                                 "<title>([^<]*)</title>", 1))
            .join(links, "url")
            .select(
                "url", "shard",
                wat_payload_col(
                    F.col("url"), F.col("title"), F.col("links")
                ).alias("payload"),
            )
        )
        recs = read_warc_records(wat_segments(payloads), "segment")
        return recs.select(
            "shard", "record_idx",
            F.col("target_uri").alias("url"),
            "warc_type", "content_length",
            F.get_json_object(
                F.col("payload").cast("string"),
                "$['Envelope']['Payload-Metadata']"
                "['HTTP-Response-Metadata']['HTML-Metadata']"
                "['Head']['Title']").alias("title"),
            F.sha2(F.col("payload"), 256).alias("digest"),
        )
    q["wat_export"] = wat_export

    def redirect_resolution(spark, sf):
        """3xx redirect-chain resolution by pointer doubling: a chain
        family (u/N -> u/N-1 down to the previous multiple of 50, so
        lengths 1..49 against a 16-hop budget) plus 2-cycles hung on
        multiples of 100 (u/N <-> w/N), which also turn the chains
        that END there into rho-shaped traps. The oracle walks the
        same edges with a recursive CTE, so the doubling arithmetic,
        the hop clamp, and the loop flag are all pinned exactly."""
        from commoncrawl_spark.operators.links import resolve_redirects

        d = _read(spark, sf, "documents").select("doc_id")
        u = lambda c: F.concat(F.lit("https://r.test/u/"),  # noqa: E731
                               c.cast("string"))
        w = lambda c: F.concat(F.lit("https://r.test/w/"),  # noqa: E731
                               c.cast("string"))
        chain = d.filter(F.col("doc_id") % 50 != 0).select(
            u(F.col("doc_id")).alias("url"),
            u(F.col("doc_id") - 1).alias("location"))
        cyc_ids = d.filter(F.col("doc_id") % 100 == 0)
        cyc = cyc_ids.select(
            u(F.col("doc_id")).alias("url"),
            w(F.col("doc_id")).alias("location"),
        ).unionByName(cyc_ids.select(
            w(F.col("doc_id")).alias("url"),
            u(F.col("doc_id")).alias("location"),
        ))
        return resolve_redirects(
            chain.unionByName(cyc), max_hops=16)
    q["redirect_resolution"] = redirect_resolution

    def page_directives_q(spark, sf):
        """In-HTML crawl directives over synthesized pages cycling
        through the real cases: meta robots noindex,nofollow / index,
        follow / absent (by doc_id%3), rel=canonical present half the
        time (relative href, absolutized), and a nofollow anchor every
        4th page. The oracle recomputes every flag from the generating
        templates, so the attribute-order-tolerant regexes, the token
        boundary match, and the absolutization are all pinned."""
        from commoncrawl_spark.operators.links import page_directives

        d = _read(spark, sf, "documents").select("doc_id")
        meta = (
            F.when(F.col("doc_id") % 3 == 0,
                   '<meta name="robots" content="noindex, nofollow">')
            .when(F.col("doc_id") % 3 == 1,
                  '<meta content="index, follow" name="robots">')
            .otherwise("")
        )
        canon = F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<link rel="canonical" href="/c/'),
                     (F.col("doc_id") % 13).cast("string"),
                     F.lit('">')),
        ).otherwise("")
        a2 = F.when(
            F.col("doc_id") % 4 == 0,
            '<a rel="nofollow" href="/l/2">b</a>',
        ).otherwise('<a href="/l/2">b</a>')
        pages = d.select(
            F.concat(F.lit("https://pd"),
                     (F.col("doc_id") % 5).cast("string"),
                     F.lit(".test/a/"),
                     F.col("doc_id").cast("string")).alias("url"),
            F.concat(F.lit("<html><head>"), meta, canon,
                     F.lit('</head><body><a href="/l/1">a</a>'), a2,
                     F.lit("</body></html>")).cast("binary").alias("html"),
        )
        return page_directives(pages)
    q["page_directives"] = page_directives_q

    def mime_sniff(spark, sf):
        """Magic-byte MIME detection over payloads cycling through the
        ASCII-representable signatures (PDF, GIF, doctype-HTML,
        bare-tag HTML with leading whitespace and mixed case, JSON,
        XML declaration, plain text); the binary signatures (gzip,
        PNG, JPEG, zip) are pinned byte-for-byte in pytest where real
        non-ASCII bytes can be constructed."""
        from commoncrawl_spark.functions.extract import sniff_mime_col

        d = _read(spark, sf, "documents").select("doc_id")
        payload = (
            F.when(F.col("doc_id") % 7 == 0, F.lit("%PDF-1.4 obj"))
            .when(F.col("doc_id") % 7 == 1, F.lit("GIF89a;frame"))
            .when(F.col("doc_id") % 7 == 2,
                  F.lit("<!DOCTYPE html><html></html>"))
            .when(F.col("doc_id") % 7 == 3, F.lit('  <Html lang="en">'))
            .when(F.col("doc_id") % 7 == 4, F.lit('{"k": 1}'))
            .when(F.col("doc_id") % 7 == 5,
                  F.lit('<?xml version="1.0"?><a/>'))
            .otherwise(
                F.concat(F.lit("plain words "),
                         F.col("doc_id").cast("string")))
        ).cast("binary")
        return d.select(
            "doc_id", sniff_mime_col(payload).alias("mime"))
    q["mime_sniff"] = mime_sniff

    def bitext_pairs(spark, sf):
        """Margin-based bitext mining (Artetxe & Schwenk ACL'19, the
        CCMatrix method) between the label<5 and label>=5 embedding
        slices: ratio margin over k=4 neighborhood means cancels
        hubness; forward-best per source doc, kept at margin >= 1.1.
        Every step 6dp-rounded with id tiebreaks, so the oracle
        replays cosine fold -> k-NN means -> margin -> argmax."""
        from commoncrawl_spark.operators.similarity import (
            bitext_margin_pairs,
        )

        e = _read(spark, sf, "embeddings")
        return bitext_margin_pairs(
            e.filter(F.col("label") < 5),
            e.filter(F.col("label") >= 5),
            k=4, threshold=1.1)
    q["bitext_pairs"] = bitext_pairs

    def alias_collapse(spark, sf):
        """The composed URL-identity pipeline: odd doc urls 301 to
        their even twin (resolve_redirects), even pages declare a
        rel=canonical (page_directives), and capture identity =
        coalesce(canonical-of-final, final) — so a capture of the odd
        alias, the even variant, and any other url sharing the
        canonical all collapse to ONE corpus identity (the fetch-side
        and publisher-side alias machinery chained, which is how real
        pipelines dedup print/AMP/redirect variants before any text
        hashing runs). Output: one row per identity with alias count
        and the min alias url."""
        from commoncrawl_spark.operators.links import (
            page_directives,
            resolve_redirects,
        )

        d = _read(spark, sf, "documents").select("doc_id")
        u = lambda c: F.concat(F.lit("https://ac.test/a/"),  # noqa: E731
                               c.cast("string"))
        even = d.filter(F.col("doc_id") % 2 == 0)
        odd = d.filter(F.col("doc_id") % 2 == 1)
        pages = even.select(
            u(F.col("doc_id")).alias("url"),
            F.concat(
                F.lit('<html><head><link rel="canonical" href="/c/'),
                (F.col("doc_id") % 13).cast("string"),
                F.lit('"></head></html>'),
            ).cast("binary").alias("html"),
        )
        redirects = odd.select(
            u(F.col("doc_id")).alias("url"),
            u(F.col("doc_id") - 1).alias("location"))
        resolved = resolve_redirects(redirects, max_hops=4)
        finals = (
            odd.select(u(F.col("doc_id")).alias("url"))
            .join(resolved.select("url", "final_url"), "url", "left")
            .select("url", F.coalesce("final_url", "url").alias("final"))
            .unionByName(
                even.select(u(F.col("doc_id")).alias("url"),
                            u(F.col("doc_id")).alias("final")))
        )
        canon = page_directives(pages).select(
            F.col("url").alias("final"), "canonical_url")
        return (
            finals.join(canon, "final", "left")
            .select(
                "url",
                F.coalesce("canonical_url", "final").alias("identity"))
            .groupBy("identity")
            .agg(F.count(F.lit(1)).alias("n_aliases"),
                 F.min("url").alias("first_url"))
        )
    q["alias_collapse"] = alias_collapse

    def _dust_captures(spark, sf):
        """Synthetic capture evidence for the DUST miner: 13 hosts x 5
        paths; content depends on (host, path, sort) but NOT on the
        session param — so witness groups that vary only `session` keep
        one digest (irrelevant) while groups that vary only `sort` see
        the digest change (relevant)."""
        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        return d.select(
            F.concat(
                F.lit("https://h"), (i % 13).cast("string"),
                F.lit(".dust.test/item/"), (i % 5).cast("string"),
                F.lit("?sort="), (i % 3).cast("string"),
                F.lit("&session=s"), (i % 7).cast("string"),
            ).alias("url"),
            F.md5(F.concat_ws(
                "-", (i % 13).cast("string"), (i % 5).cast("string"),
                (i % 3).cast("string"))).alias("digest"),
        )

    def dust_param_rules(spark, sf):
        """DUST rule mining (Bar-Yossef et al. WWW'07, query-param
        fragment): witness groups = captures identical except one
        param's value; a param is irrelevant on a host iff >= 2 groups
        varied it and none changed the content digest. The oracle
        rebuilds witness keys with the same md5(base || sorted-others)
        serialization."""
        from commoncrawl_spark.operators.dust import mine_irrelevant_params

        return mine_irrelevant_params(_dust_captures(spark, sf))
    q["dust_param_rules"] = dust_param_rules

    def dust_collapse(spark, sf):
        """Mined-rule application: strip each host's irrelevant params
        from its frontier URLs and count the alias collapse — the crawl
        budget the miner just saved (session-exploded URLs fold to one
        fetch per true page)."""
        from commoncrawl_spark.operators.dust import (
            mine_irrelevant_params,
            strip_irrelevant_params,
        )

        caps = _dust_captures(spark, sf)
        rules = mine_irrelevant_params(caps)
        collapsed = strip_irrelevant_params(caps.select("url"), rules)
        from commoncrawl_spark.functions.urls import host_col

        return (
            collapsed
            .groupBy(host_col(F.col("url")).alias("host"))
            .agg(
                F.count_distinct("url").alias("n_urls"),
                F.count_distinct("url_collapsed").alias("n_collapsed"),
            )
        )
    q["dust_collapse"] = dust_collapse

    def focused_frontier_scores(spark, sf):
        """Shark-search focused-crawl scoring (Hersovici et al. WWW'98):
        crawled parents carry a topical relevance, links carry anchor
        text; each child's potential = gamma*inherited + (1-gamma)*
        (beta*anchor + (1-beta)*parent), max over parents with a
        deterministic min-parent tie-break. Anchors rotate through
        2-term / 1-term / 0-term matches so the anchor signal genuinely
        varies; a quarter of parents are uncrawled (no score row) and
        their links must vanish."""
        from commoncrawl_spark.operators.focused import focused_frontier

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        purl = F.concat(F.lit("https://f"), (i % 11).cast("string"),
                        F.lit(".foc.test/p/"), i.cast("string"))
        pages = d.filter(i % 4 != 3).select(
            purl.alias("url"),
            (((i * 7) % 10) / 10.0).alias("relevance"))
        anchor = F.element_at(
            F.array(F.lit("data pipelines guide"), F.lit("the data page"),
                    F.lit("misc stuff")),
            ((i % 3) + 1).cast("int"))
        links = d.select(
            purl.alias("src_url"),
            F.concat(F.lit("https://c"), ((i * 3 + 1) % 11).cast("string"),
                     F.lit(".foc.test/c/"),
                     ((i * i) % 37).cast("string")).alias("abs_url"),
            anchor.alias("anchor"))
        out = focused_frontier(pages, links, ["data", "pipelines"])
        return out.select(
            "url",
            F.round("potential", 6).alias("potential"),
            F.round("inherited", 6).alias("inherited"),
            F.round("neighborhood", 6).alias("neighborhood"),
            "best_parent")
    q["focused_frontier"] = focused_frontier_scores

    def aimd_rates(spark, sf):
        """AIMD adaptive politeness: replay each host's fetch outcomes
        in time order — success +0.25 req/s (cap 8.0), failure x0.5
        (floor 0.125). All constants are exact binary fractions, so the
        Spark aggregate-lambda fold and the DuckDB list_reduce replay
        are bit-equal and the value hash must match."""
        from commoncrawl_spark.operators.schedule import aimd_host_rates

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        log = d.select(
            F.concat(F.lit("h"), (i % 17).cast("string"),
                     F.lit(".aimd.test")).alias("host"),
            i.alias("ts"),
            (((i * i) % 5) != 0).alias("ok"),
        )
        return aimd_host_rates(log)
    q["aimd_rates"] = aimd_rates

    def url_word_filter(spark, sf):
        """RefinedWeb-style weighted URL word scoring: soft token
        weights (casino 1.0, poker/slots 0.5, free 0.25) summed over
        the URL's alphanumeric tokens, plus a strict substring list
        ('xxx', catching it inside concatenated domain labels where
        tokenization can't). blocked = strict OR score >= 1.0. The
        oracle recomputes both signals from the generating residues."""
        from commoncrawl_spark.operators.blocklist import url_word_scores

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        seg1 = F.element_at(
            F.array(F.lit("casino"), F.lit("news"), F.lit("poker"),
                    F.lit("blog"), F.lit("slots")), (i % 5 + 1).cast("int"))
        seg2 = F.element_at(
            F.array(F.lit("free"), F.lit("read"), F.lit("daily")),
            (i % 3 + 1).cast("int"))
        hostpart = F.when(i % 11 == 0, F.lit("myxxxsite")).otherwise(
            F.concat(F.lit("w"), (i % 9).cast("string")))
        urls = d.select(F.concat(
            F.lit("https://"), hostpart, F.lit(".score.test/"), seg1,
            F.lit("/"), seg2, F.lit("-"), i.cast("string")).alias("url"))
        return url_word_scores(
            urls,
            {"casino": 1.0, "poker": 0.5, "slots": 0.5, "free": 0.25},
            strict_terms=["xxx"], threshold=1.0)
    q["url_word_filter"] = url_word_filter

    def adaptive_frontier_pipeline(spark, sf):
        """The adaptive-admission frontier composed end-to-end: capture
        evidence -> DUST param mining -> alias collapse (session ids
        die) -> weighted URL word filter (casino paths die) -> AIMD
        rates from the host's fetch history -> per-host quota ->
        salted politeness batch. The oracle rebuilds every stage from
        the generating residues, so the hash pins the whole chain:
        mined rules, collapse, scoring, the bit-exact rate fold, quota
        clamps, and the final per-host top-k."""
        from commoncrawl_spark.operators.blocklist import url_word_scores
        from commoncrawl_spark.operators.dust import (
            mine_irrelevant_params,
            strip_irrelevant_params,
        )
        from commoncrawl_spark.operators.schedule import (
            aimd_host_rates,
            select_polite_batch,
            with_host,
        )

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        seg = F.element_at(
            F.array(F.lit("casino"), F.lit("news"), F.lit("poker"),
                    F.lit("blog"), F.lit("docs")), (i % 5 + 1).cast("int"))
        caps = d.select(
            F.concat(
                F.lit("https://h"), (i % 7).cast("string"),
                F.lit(".pipe.test/"), seg, F.lit("/"),
                (i % 5).cast("string"),
                F.lit("?sort="), (i % 3).cast("string"),
                F.lit("&session=s"), (i % 11).cast("string"),
            ).alias("url"),
            F.md5(F.concat_ws(
                "-", (i % 7).cast("string"), (i % 5).cast("string"),
                (i % 3).cast("string"))).alias("digest"),
        )
        rules = mine_irrelevant_params(caps)
        collapsed = (
            strip_irrelevant_params(caps.select("url"), rules)
            .select(F.col("url_collapsed").alias("url"))
            .distinct()
        )
        kept = url_word_scores(
            collapsed, {"casino": 1.0, "poker": 0.5}, threshold=1.0,
        ).filter(~F.col("blocked")).select("url")
        log = d.select(
            F.concat(F.lit("h"), (i % 7).cast("string"),
                     F.lit(".pipe.test")).alias("host"),
            i.alias("ts"),
            ((i % (3 + (i % 7))) != 0).alias("ok"))
        budgets = aimd_host_rates(log).select(
            "host",
            F.greatest(F.lit(1), F.least(
                F.lit(4), F.floor("rate").cast("int"))).alias("quota"))
        frontier = (
            with_host(kept)
            .withColumn("url_sha1", F.sha1(F.col("url")))
            .join(budgets, "host", "left")
        )
        batch = select_polite_batch(
            frontier, budget_per_host=4, salt_buckets=8,
            priority_cols=("url",), budget_col="quota")
        return batch.select("host", "url", "host_rank")
    q["adaptive_frontier_pipeline"] = adaptive_frontier_pipeline

    def revalidation_bandwidth(spark, sf):
        """Conditional-GET planning (RFC 9110 validators) over a
        recrawl frontier: ETag beats Last-Modified beats unconditional;
        expected refetch bytes = p*body + (1-p)*304-overhead when a
        validator is worthwhile. Rolled up per validator class — the
        bandwidth ledger a recrawl budget reads."""
        from commoncrawl_spark.operators.temporal import revalidation_plan

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        frontier = d.select(
            F.concat(F.lit("https://rv.test/"), i.cast("string"))
            .alias("url"),
            ((i % 10) / 10.0).alias("p_changed"),
            (F.lit(400) + (i % 50) * 100).cast("long")
            .alias("content_length"),
            F.when(i % 3 == 0,
                   F.concat(F.lit('"e'), i.cast("string"), F.lit('"')))
            .alias("etag"),
            F.when(i % 4 == 0, F.lit("Mon, 01 Jan 2024 00:00:00 GMT"))
            .alias("last_modified"),
        )
        planned = revalidation_plan(frontier)
        return planned.groupBy("validator").agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.round(F.sum("expected_bytes"), 6).alias("expected_total"),
            F.round(F.sum("saved_bytes"), 6).alias("saved_total"),
        )
    q["revalidation_bandwidth"] = revalidation_bandwidth

    def seed_depth_rings(spark, sf):
        """Depth-limited crawl scope (Heritrix maxdepth): BFS link
        distance from vetted seeds {0,10,20} over the skewed synthetic
        host graph, max_depth=4 — frontier ring sizes are the seed-
        coverage diagnostic. Unreached hosts are absent, not infinity
        rows. The oracle is a bounded recursive-CTE BFS."""
        from commoncrawl_spark.operators.graph import seed_distances

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        seeds = spark.range(3).select((F.col("id") * 10).alias("node"))
        return seed_distances(edges, seeds, max_depth=4)
    q["seed_depth_rings"] = seed_depth_rings

    def script_profile(spark, sf):
        """Writing-system histogram next to language ID: per-script
        character counts via scan-stage regexp class removal (explicit
        codepoint ranges so Java regex and RE2 agree), dominant script
        = first in SCRIPT_RANGES order achieving the max, 'none' for
        script-less rows. Docs get deterministic Cyrillic/CJK/Arabic
        tails so every class and the tie rules are exercised."""
        from commoncrawl_spark.functions.text import script_count_cols

        d = _read(spark, sf, "documents").select("doc_id", "text")
        i = F.col("doc_id")
        tail = (
            F.when(i % 4 == 0, F.lit(" Привет мир"))
            .when(i % 4 == 1, F.lit(" 你好世界"))
            .when(i % 4 == 2, F.lit(" مرحبا"))
            .otherwise(F.lit(""))
        )
        mixed = d.select(
            "doc_id", F.concat(F.col("text"), tail).alias("text"))
        cols = script_count_cols(F.col("text"))
        return mixed.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()])
    q["script_profile"] = script_profile

    def vocab_coverage(spark, sf):
        """Good-Turing unseen mass (n1/N) and Chao1 richness
        (V + n1^2/2n2) per language — the 'is this slice big enough to
        freeze a vocab on' diagnostics, computed from one token
        frequency-spectrum pass."""
        from commoncrawl_spark.operators.analytics import (
            vocab_coverage_stats,
        )

        d = _read(spark, sf, "documents").select("lang", "text")
        return vocab_coverage_stats(d, group_col="lang")
    q["vocab_coverage"] = vocab_coverage

    def softdedup_weights(spark, sf):
        """Soft dedup (keep every copy, weight 1/cluster-size) over the
        exact-duplicate doubled corpus: every doc pairs with its
        identical twin -> weight 0.5, weighted_tokens halve, and the
        effective corpus size equals the unique corpus — without
        choosing which copy to destroy."""
        from commoncrawl_spark.operators.selection import (
            soft_dedup_weights,
        )

        return soft_dedup_weights(_docs_dup_spark(spark, sf))
    q["softdedup_weights"] = softdedup_weights

    def cdc_dedup(spark, sf):
        """Content-defined chunking dedup ledger — FULL oracle since
        round 3 session 9: the Gear rolling hash replays in DuckDB as
        a list_reduce byte fold (the md5-derived GEAR table inlined,
        md5 standing in for sha1 as the distinctness key — the ledger
        is digest-free aggregates, so any injective chunk digest gives
        identical stats). Each doc yields its payload and a
        prefix-shifted copy; CDC re-aligns after the shift, so stored
        bytes land well under the 2x logical size where fixed blocking
        would find nothing. Kernel parity + boundary-shift tests in
        tests/test_cdc.py."""
        from commoncrawl_spark.operators.cdc import (
            cdc_chunk_table,
            chunk_dedup_stats,
        )

        d = _read(spark, sf, "documents").select("doc_id", "text")
        body = F.concat_ws(" ", F.array_repeat(F.col("text"), 4))
        segs = d.select(
            F.col("doc_id").alias("segment_id"),
            F.encode(body, "utf-8").alias("payload"),
        ).unionByName(d.select(
            (F.col("doc_id") + 1000000).alias("segment_id"),
            F.encode(F.concat(F.lit("shift-"),
                              F.col("doc_id").cast("string"),
                              F.lit(" "), body), "utf-8").alias("payload"),
        ))
        chunks = cdc_chunk_table(segs, avg_bits=8, min_len=32,
                                 max_len=2048)
        return chunk_dedup_stats(chunks)
    q["cdc_dedup"] = cdc_dedup

    def fetch_timetable_q(spark, sf):
        """The politeness loop closed end-to-end: AIMD rates from the
        host's fetch history assign concrete dispatch times — the k-th
        URL of a host (priority order) fires at k/rate seconds into the
        round. Oracle replays the rate fold AND the timetable window."""
        from commoncrawl_spark.operators.schedule import (
            aimd_host_rates,
            fetch_timetable,
        )

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        log = d.select(
            F.concat(F.lit("h"), (i % 17).cast("string"),
                     F.lit(".aimd.test")).alias("host"),
            i.alias("ts"),
            (((i * i) % 5) != 0).alias("ok"),
        )
        batch = d.filter(i % 5 == 0).select(
            F.concat(F.lit("h"), (i % 17).cast("string"),
                     F.lit(".aimd.test")).alias("host"),
            F.concat(F.lit("https://h"), (i % 17).cast("string"),
                     F.lit(".aimd.test/"), i.cast("string")).alias("url"),
        )
        rates = aimd_host_rates(log).select("host", "rate")
        return fetch_timetable(batch, rates, round_start=0.0)
    q["fetch_timetable"] = fetch_timetable_q

    def host_shard_ring(spark, sf):
        """Consistent-hash fetcher affinity: 251 hosts onto an 8-shard
        ring with 32 virtual nodes each (md5-u32 positions, the
        engine's reproducible hash convention). The minimal-movement
        resize property is pinned in pytest; the oracle rebuilds the
        identical ring and picks the first clockwise owner with the
        same (pos, shard) tie order and wrap fallback."""
        from commoncrawl_spark.operators.schedule import (
            consistent_host_shards,
        )

        d = _read(spark, sf, "documents").select("doc_id")
        hosts = d.select(
            F.concat(F.lit("h"), (F.col("doc_id") % 251).cast("string"),
                     F.lit(".shard.test")).alias("host"))
        return consistent_host_shards(hosts, n_shards=8, vnodes=32)
    q["host_shard_ring"] = host_shard_ring

    def embedding_outliers_q(spark, sf):
        """Centroid-distance outlier prune (the SemDeDup-adjacent
        prototypicality pass): top-25 farthest vectors from the
        quantized-integer corpus centroid — distances are exact int64
        folds, so ranking and values are bit-stable and the oracle
        replays them hash-exact."""
        from commoncrawl_spark.operators.similarity import (
            embedding_outliers,
        )

        return embedding_outliers(_read(spark, sf, "embeddings"),
                                  top_k=25)
    q["embedding_outliers"] = embedding_outliers_q

    def retrieval_metrics(spark, sf):
        """The search-family eval harness on a synthetic gold set: 5
        queries x 10-deep rankings vs graded judgments (incl. rel=0
        rows and judged-but-unsearched coverage) -> per-query MRR,
        precision@10, recall@10, nDCG@10. The oracle replays the exact
        TREC arithmetic (2^rel-1 gains, log2 discounts, ideal ranking
        by rel desc)."""
        from commoncrawl_spark.operators.index import retrieval_eval

        d = _read(spark, sf, "documents").select("doc_id")
        docs100 = d.select((F.col("doc_id") % 100).alias("doc")).distinct()
        qspan = spark.range(5).select(F.col("id").alias("qid"))
        ranks = spark.range(1, 11).select(F.col("id").alias("rank"))
        results = qspan.crossJoin(ranks).select(
            F.concat(F.lit("q"), F.col("qid").cast("string"))
            .alias("query_id"),
            ((F.col("qid") * 13 + F.col("rank") * 7) % 100).alias("doc_id"),
            F.col("rank").cast("int").alias("rank"))
        qrels = qspan.crossJoin(docs100).filter(
            (F.col("doc") + F.col("qid")) % 4 == 0).select(
            F.concat(F.lit("q"), F.col("qid").cast("string"))
            .alias("query_id"),
            F.col("doc").alias("doc_id"),
            (F.col("doc") % 3).cast("int").alias("rel"))
        return retrieval_eval(results, qrels, k=10)
    q["retrieval_metrics"] = retrieval_metrics

    def anchor_bm25(spark, sf):
        """The classic web-search anchor-text field: pages are indexed
        by how OTHER pages describe them (anchor text beats on-page
        text for navigational queries — the original Google/WAND
        design). Links collapse per target into a sorted concatenated
        anchor field; BM25 ranks targets for ['join', 'scan'] over that
        derived corpus. Oracle rebuilds the field with string_agg and
        replays the exact BM25 arithmetic."""
        from commoncrawl_spark.operators.index import bm25_search

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        anchor = F.element_at(
            F.array(F.lit("fast spark join"), F.lit("hash index scan"),
                    F.lit("news archive feed"), F.lit("deep join scan")),
            ((i % 4) + 1).cast("int"))
        links = d.select(
            ((i * i + 7) % 50).alias("target"), anchor.alias("anchor"))
        field = (
            links.groupBy("target")
            .agg(F.concat_ws(
                " ", F.array_sort(F.collect_list("anchor"))).alias("text"))
            .select(F.col("target").alias("doc_id"), "text")
        )
        return bm25_search(field, ["join", "scan"], top_k=10)
    q["anchor_bm25"] = anchor_bm25

    def snapshot_term_drift(spark, sf):
        """Corpus drift monitoring between two crawl snapshots: even
        docs are snapshot A, odd docs are snapshot B with a synthetic
        'breaking election results' burst on every 5th doc — top-20
        terms by smoothed probability shift, with log-odds direction.
        Per-term arithmetic only, so every value replays exactly."""
        from commoncrawl_spark.operators.analytics import term_drift

        d = _read(spark, sf, "documents").select("doc_id", "text")
        i = F.col("doc_id")
        a = d.filter(i % 2 == 0).select("text")
        b = d.filter(i % 2 == 1).select(
            F.when(i % 5 == 0,
                   F.concat(F.col("text"),
                            F.lit(" breaking election results")))
            .otherwise(F.col("text")).alias("text"))
        return term_drift(a, b, top_k=20)
    q["snapshot_term_drift"] = snapshot_term_drift

    def zipf_slope(spark, sf):
        """Zipf rank-frequency OLS fit over the top-2000 terms — the
        corpus-health scalar (natural text: slope ~ -1; template spam
        flattens it). Regression points quantize to 1e-6 longs so the
        sums are exact integers and slope/intercept/r2 replay bit-equal
        in the oracle."""
        from commoncrawl_spark.operators.analytics import zipf_fit

        return zipf_fit(_read(spark, sf, "documents"), max_rank=2000)
    q["zipf_slope"] = zipf_slope

    def ngram_diversity_q(spark, sf):
        """Distinct-1/2/3-gram ratios per language — the degeneration
        diagnostic (looping generators and boilerplate crater
        distinct-2/3 first). One explode + count-distinct per n."""
        from commoncrawl_spark.operators.analytics import ngram_diversity

        d = _read(spark, sf, "documents").select("lang", "text")
        return ngram_diversity(d, group_col="lang", max_n=3)
    q["ngram_diversity"] = ngram_diversity_q

    def explore_exploit(spark, sf):
        """Epsilon-greedy crawl budget: 90% exploits 20 known hosts
        proportional to score, 10% explores 9 never-crawled hosts
        uniformly with the md5-smallest hosts taking the remainder —
        deterministic bandit allocation, re-planned identically on
        resume."""
        from commoncrawl_spark.operators.schedule import (
            explore_exploit_budget,
        )

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        hosts = d.select(
            F.concat(F.lit("h"), (i % 29).cast("string"),
                     F.lit(".ee.test")).alias("host"),
            ((i % 29) + 1).cast("double").alias("score"),
            ((i % 29) < 20).alias("known"),
        ).distinct()
        return explore_exploit_budget(hosts, total_budget=500,
                                      epsilon=0.1)
    q["explore_exploit"] = explore_exploit

    def bloom_fpr_audit(spark, sf):
        """Seen-set quality audit — FULL-ORACLE as of r5: build the
        Bloom blob table at fp_rate=0.01 from the seeded seen keys,
        probe an equal number of DISJOINT fresh keys, report the
        measured false-positive rate against the configured budget. A
        crawl runs this against every blob generation — FPR drift above
        budget means the bucket sizing no longer matches the key count
        and re-fetch waste is growing.

        The Bloom bit derivation (_key_indices) reads k fixed 32-bit
        hex slices of the key itself, so the ONLY engine-private step
        was the xxhash64 bucket assignment. The audit therefore keys on
        a 48-hex-char md5-concat digest (chars 1-40 feed the k<=5 bit
        slices, chars 41-48 the bucket — disjoint, so bucket choice
        stays uncorrelated with bit positions) and passes the hex-slice
        bucket_expr to build/probe. Every step — params per bucket, bit
        sets, membership — then replays exactly in DuckDB SQL; the FPR
        contract gets a hard hash row instead of rows-only."""
        from commoncrawl_spark.operators.seen_set import (
            bloom_prefilter,
            build_bloom_table,
        )

        d = _read(spark, sf, "documents").select("doc_id")
        tenfold = d.select(
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("j"),
            F.col("doc_id"))

        def keyed(prefix):
            base = F.concat(F.lit(prefix), F.col("doc_id").cast("string"),
                            F.lit("-"), F.col("j").cast("string"))
            return tenfold.select(
                F.concat(
                    F.md5(base),
                    F.substring(F.md5(F.concat(F.lit("salt:"), base)), 1, 16),
                ).alias("url_key"))

        bucket = F.pmod(
            F.conv(F.substring(F.col("url_key"), 41, 8), 16, 10)
            .cast("long"),
            F.lit(16))
        blooms = build_bloom_table(keyed("seen-"), n_buckets=16,
                                   fp_rate=0.01, key="url_key",
                                   bucket_expr=bucket)
        flagged = bloom_prefilter(keyed("fresh-"), blooms, 16,
                                  key="url_key", bucket_expr=bucket)
        return flagged.agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.col("_maybe_seen").cast("int"))
            .alias("false_positives"),
            F.round(F.sum(F.col("_maybe_seen").cast("int"))
                    / F.count(F.lit(1)), 6).alias("fpr"),
            F.lit(0.01).alias("fp_budget"),
        )
    q["bloom_fpr_audit"] = bloom_fpr_audit

    def curation_attribution(spark, sf):
        """Dolma-style rejection attribution over the doubled corpus:
        each doc gets the FIRST verdict in chain order (too_short ->
        too_repetitive -> duplicate -> kept), then the funnel rollup —
        the 'why did the corpus shrink' ledger a curation run
        publishes. Precedence matters: a short duplicate counts as
        short, so rule counts sum to the corpus exactly once."""
        from commoncrawl_spark.operators.analytics import (
            attribution_funnel,
            first_match_verdict,
            tokens_col,
        )

        d = _docs_dup_spark(spark, sf)
        toks = tokens_col(F.col("text"))
        feats = d.select(
            "doc_id",
            F.md5(F.col("text")).alias("fp"),
            F.size(toks).alias("nt"),
            F.when(F.size(toks) == 0, F.lit(1.0))
            .otherwise(F.size(F.array_distinct(toks))
                       / F.size(toks).cast("double")).alias("ratio"),
        )
        winners = feats.groupBy("fp").agg(F.min("doc_id").alias("keeper"))
        tagged = first_match_verdict(
            feats.join(winners, "fp"),
            [
                ("too_short", F.col("nt") < 30),
                ("too_repetitive", F.col("ratio") < 0.4),
                ("duplicate", F.col("doc_id") != F.col("keeper")),
            ])
        return attribution_funnel(tagged)
    q["curation_attribution"] = curation_attribution

    def lsh_plan(spark, sf):
        """MinHash-LSH banding planner: S-curve collision probabilities
        for every factorization of 128 hashes at/around the 0.8 target
        — pure math, the table read before fixing (bands, rows)."""
        from commoncrawl_spark.operators.text_dedup import (
            lsh_banding_plan,
        )

        return lsh_banding_plan(spark, num_hashes=128, threshold=0.8)
    q["lsh_plan"] = lsh_plan

    def host_boilerplate(spark, sf):
        """Per-host template removal (the statistical analog of the
        reference's per-site selector lists): 2-word segments appearing
        on >= 3 docs AND >= 10% of a host's docs are boilerplate; strip
        them and rebuild each document. Segmentation is per-row, the
        frequency agg shuffles only (host, md5, id) triples, and the
        removal is a broadcast anti-join on the slim boilerplate set."""
        from commoncrawl_spark.operators.text_dedup import (
            strip_host_boilerplate,
        )

        d = _read(spark, sf, "documents").select("doc_id", "source", "text")
        return strip_host_boilerplate(
            d, host_col="source", seg_words=2, min_docs=3, min_frac=0.1)
    q["host_boilerplate"] = host_boilerplate

    def sitemap_discovery(spark, sf):
        """Synthetic robots.txt bodies (per-doc hosts, two Sitemap
        directives in mixed case/whitespace plus a decoy) -> directive
        extraction -> synthesized urlset/sitemapindex XML -> <loc>
        extraction with the nested-index flag. The oracle rebuilds the
        expected rows from first principles, so a directive mis-parse,
        a missed/extra loc, or a wrong is_index flag breaks the hash."""
        from commoncrawl_spark.operators.links import (
            extract_sitemap_locs,
            sitemap_urls_from_robots,
        )

        d = _read(spark, sf, "documents").select("doc_id", "source")
        host = F.concat(F.col("source"), F.lit("-"),
                        F.col("doc_id").cast("string"), F.lit(".sm.test"))
        robots_txt = F.concat(
            F.lit("User-agent: *\nDisallow: /tmp\nSitemap: https://"),
            host, F.lit("/sitemap.xml\n  sitemap:\thttps://"),
            host, F.lit("/news/index.xml\nBadSitemap: https://"),
            host, F.lit("/no.xml\n"),
        )
        robots = d.select(host.alias("host"), robots_txt.alias("robots_txt"),
                          "doc_id")
        smu = sitemap_urls_from_robots(robots).join(
            robots.select("host", "doc_id"), "host")
        urlset = F.concat(
            F.lit('<?xml version="1.0"?><urlset><url><loc>https://'),
            F.col("host"), F.lit("/p/"), (F.col("doc_id") % 7).cast("string"),
            F.lit("</loc></url><url> <loc>\n  https://"),
            F.col("host"), F.lit("/q/"), (F.col("doc_id") % 3).cast("string"),
            F.lit("\n </loc></url></urlset>"),
        )
        index = F.concat(
            F.lit('<?xml version="1.0"?><sitemapindex><sitemap><loc>https://'),
            F.col("host"), F.lit("/maps/part-"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".xml</loc></sitemap></sitemapindex>"),
        )
        xml = F.when(F.col("sitemap_url").endswith("/sitemap.xml"), urlset) \
            .otherwise(index)
        sm = smu.select("sitemap_url", F.encode(xml, "utf-8").alias("xml"))
        return extract_sitemap_locs(sm).select("sitemap_url", "is_index", "loc")
    q["sitemap_discovery"] = sitemap_discovery

    def sitemap_tree(spark, sf):
        """Recursive sitemap-index expansion: per document a root
        <sitemapindex> (one loc space-padded, one UPPERCASE nested
        index, one dangling loc with no body) fans out to a urlset
        (2 pages, depth 1) and through the nested index to a grandchild
        urlset (1 page, depth 2). Bounded lookup-join recursion — the
        oracle re-derives every expected loc from the generating
        arithmetic, so any mis-parse or depth error breaks the hash."""
        from commoncrawl_spark.operators.links import expand_sitemap_tree

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id").cast("string")
        base = F.concat(F.lit("https://s"), i, F.lit(".test/"))
        root = d.select(
            F.concat(base, F.lit("sitemap.xml")).alias("url"),
            F.concat(
                F.lit('<?xml version="1.0"?><sitemapindex><sitemap><loc> '),
                base, F.lit("sm-a.xml </loc></sitemap><sitemap><loc>"),
                base, F.lit("sm-b.xml</loc></sitemap><sitemap><loc>"),
                base, F.lit("sm-missing.xml</loc></sitemap></sitemapindex>"),
            ).alias("xml"))
        child_a = d.select(
            F.concat(base, F.lit("sm-a.xml")).alias("url"),
            F.concat(
                F.lit("<urlset><url><loc>"), base, F.lit("p/"), i,
                F.lit("/1</loc></url><url><loc>"), base, F.lit("p/"), i,
                F.lit("/2</loc></url></urlset>")).alias("xml"))
        child_b = d.select(
            F.concat(base, F.lit("sm-b.xml")).alias("url"),
            F.concat(
                F.lit("<SITEMAPINDEX><sitemap><loc>"), base,
                F.lit("sm-c.xml</loc></sitemap></SITEMAPINDEX>"),
            ).alias("xml"))
        child_c = d.select(
            F.concat(base, F.lit("sm-c.xml")).alias("url"),
            F.concat(
                F.lit("<urlset><url><loc>"), base, F.lit("p/"), i,
                F.lit("/3</loc></url></urlset>")).alias("xml"))
        bodies = root.unionByName(child_a).unionByName(
            child_b).unionByName(child_c)
        seeds = d.select(
            F.concat(base, F.lit("sitemap.xml")).alias("sitemap_url"))
        return expand_sitemap_tree(seeds, bodies, max_depth=2)
    q["sitemap_tree"] = sitemap_tree

    def task_fanout(spark, sf):
        """S7: index list -> one task per CDX page (create_tasks.py:85-91),
        with the processed-set resume anti-join (create_tasks.py:62-66).
        Index names/page counts derived deterministically from nation."""
        from commoncrawl_spark.sources.tasks import tasks_from_indexes

        n = _read(spark, sf, "nation")
        idx = n.select(
            F.concat(F.lit("CC-MAIN-2024-"),
                     F.lpad(F.col("n_nationkey").cast("string"), 2, "0"))
            .alias("index"),
            (F.col("n_nationkey") % 7 + 1).cast("int").alias("pages"),
            "n_nationkey",
        )
        processed = idx.filter(F.col("n_nationkey") % 5 == 0)
        out = tasks_from_indexes(
            idx.drop("n_nationkey"), target_url="example.org/*",
            processed=processed,
        )
        return out.select("index", F.col("page").cast("int").alias("page"), "url")
    q["task_fanout"] = task_fanout

    def cdx_harvest(spark, sf):
        """Entry point #1 composed and oracle-checked END TO END: CDX
        records are serialized to real JSONL page bodies (to_json +
        line_no-ordered concat), served through the transport seam,
        re-parsed JVM-side (parse_cdx_pages), and fold-deduped
        (merge_harvested). The oracle skips the byte round-trip (JSON
        parse is the identity on these records) and reproduces the fold
        over the same arrival order — any drift in task-url construction,
        JSONL framing, parsing, or fold semantics breaks the hash."""
        from commoncrawl_spark.fixtures import CRAWLS
        from commoncrawl_spark.plans.harvest import harvest_indexes, merge_harvested
        from commoncrawl_spark.sources.transport import LookupJoinTransport

        base = _events_cdx(spark, sf)
        crawls3 = F.array(*[F.lit(c) for c in CRAWLS[:3]])
        recs = base.select(
            "event_id", "url", "status", "mime_detected", "length", "timestamp",
            F.element_at(crawls3, (F.col("event_id") % 3 + 1).cast("int"))
            .alias("index"),
            (F.col("event_id") % 4).cast("int").alias("page"),
        )
        line = F.to_json(F.struct(
            F.lit("k").alias("urlkey"), F.col("timestamp"), F.col("url"),
            F.lit("text/html").alias("mime"),
            F.col("mime_detected").alias("mime-detected"),
            F.col("status"), F.lit("D").alias("digest"), F.col("length"),
            F.lit("0").alias("offset"), F.lit("f").alias("filename"),
        ))
        bodies = (
            recs.select("index", "page", F.struct("event_id", line.alias("l")).alias("s"))
            .groupBy("index", "page")
            .agg(F.concat_ws(
                "\n", F.transform(F.array_sort(F.collect_list("s")),
                                  lambda x: x["l"])).alias("body"))
        )
        task_url = F.concat(
            F.lit("https://index.commoncrawl.org/"), F.col("index"),
            F.lit("-index?url=site.test/*&output=json&page="),
            F.col("page").cast("string"),
        )
        pages = bodies.select(task_url.alias("url"),
                              F.encode("body", "utf-8").alias("html"))
        indexes = recs.groupBy("index").agg(
            (F.max("page") + 1).cast("int").alias("pages"))
        parsed, _failed = harvest_indexes(
            indexes, LookupJoinTransport(pages), "site.test/*")
        out = merge_harvested(parsed)
        return out.select(
            "canon_url", "url", "status", "mime_detected", "length",
            "timestamp", "crawl",
            F.col("page").cast("int").alias("page"),
            F.col("line_no").cast("int").alias("line_no"),
        )
    q["cdx_harvest"] = cdx_harvest

    def tag_keyword_filter(spark, sf):
        """C10 + F5 composed as the reference notebook does it
        (read_jsonl.ipynb cell 0): concat the three extracted tag arrays,
        then whole-word include/exclude scoring over the joined string.
        Pages carry deterministic Guardian tag blocks (signposting incl.
        the excluded 'Home', section label, submeta keywords) so the
        oracle reconstructs the arrays from first principles."""
        from commoncrawl_spark.fixtures import KEYWORDS
        from commoncrawl_spark.operators.extraction import extract_articles

        d = _read(spark, sf, "documents").select("doc_id")
        i = F.col("doc_id")
        kws = F.array(*[F.lit(k) for k in KEYWORDS])
        kw1 = F.element_at(kws, (i % 12 + 1).cast("int"))
        kw2 = F.element_at(kws, ((i + 4) % 12 + 1).cast("int"))
        kw3 = F.element_at(kws, ((i + 7) % 12 + 1).cast("int"))
        html = F.concat(
            F.lit('<html><body><ul class="signposting">'
                  '<li class="signposting__item"><a href="/">Home</a></li>'
                  '<li class="signposting__item"><a href="/k">'), kw1,
            F.lit('</a></li></ul>'
                  '<div class="content__labels">'
                  '<a class="content__section-label__link" href="/s">'), kw2,
            F.lit('</a></div>'
                  '<div itemprop="articleBody"><p>body</p></div>'
                  '<div class="submeta__keywords">'
                  '<a class="submeta__link" href="/t1">'), kw1,
            F.lit('</a><a class="submeta__link" href="/t2">'), kw3,
            F.lit("</a></div></body></html>"),
        )
        pages = d.select(
            "doc_id",
            F.concat(F.lit("https://t.test/"), i.cast("string")).alias("url"),
            F.encode(html, "utf-8").alias("html"),
        )
        ex = extract_articles(pages).filter(F.col("article.error").isNull())
        tags = F.concat(
            F.coalesce(F.col("article.signposting_tags"), F.array()),
            F.coalesce(F.col("article.section_labels"), F.array()),
            F.coalesce(F.col("article.keyword_tags"), F.array()),
        )
        flat = ex.select("doc_id", F.concat_ws(" ", tags).alias("tagstr"))
        out = keyword_filter(flat, F.col("tagstr"),
                             include=["climate", "ai"],
                             exclude=["markets", "football"])
        return out.select("doc_id", "tagstr", "pos", "neg")
    q["tag_keyword_filter"] = tag_keyword_filter

    # ---- dedup family ----

    def exact_dedup(spark, sf):
        return exact_duplicates(_docs_dup_spark(spark, sf)).select(
            "fingerprint", "n_docs", "keeper_id"
        )
    q["exact_dedup"] = exact_dedup

    def minhash_buckets(spark, sf):
        d = _read(spark, sf, "documents")
        return minhash_lsh_buckets(d, num_hashes=NUM_HASHES, bands=BANDS)
    q["minhash_buckets"] = minhash_buckets

    def ngram_jaccard(spark, sf):
        d = _read(spark, sf, "documents")
        half = d.count() // 2
        pairs = d.select(F.col("doc_id").alias("a")).filter(
            F.col("a") < half
        ).withColumn("b", F.col("a") + half)
        return jaccard_pairs(d, pairs)
    q["ngram_jaccard"] = ngram_jaccard

    def ssjoin_pairs(spark, sf):
        """EXACT all-pairs Jaccard >= 0.8 via prefix filtering (Vernica
        et al. SIGMOD'10) over the perturbed-twins corpus — the lossless
        complement to minhash_buckets: every qualifying pair guaranteed
        back with its exact score. Rare-first prefixes keep join buckets
        small; the oracle is the brute-force candidates-by-shared-shingle
        join (lossless for any threshold > 0), exact arithmetic both
        sides."""
        from commoncrawl_spark.operators.text_dedup import (
            set_similarity_join,
        )

        return set_similarity_join(_docs2_spark(spark, sf), threshold=0.8)
    q["ssjoin_pairs"] = ssjoin_pairs

    def lsh_recall(spark, sf):
        """Recall audit for the MinHash-LSH path: the exact
        prefix-filtered join is ground truth (every pair with J >= 0.8,
        guaranteed), LSH bucket collisions are the probe — the metric a
        dedup deployment tunes (num_hashes, bands) against before
        trusting LSH at corpus scale. One row: truth/candidate/hit
        counts + recall, all three legs slim pair frames."""
        from commoncrawl_spark.operators.text_dedup import (
            minhash_candidate_pairs,
            set_similarity_join,
        )

        d = _docs2_spark(spark, sf)
        truth = set_similarity_join(d, threshold=0.8)
        cand = minhash_candidate_pairs(
            d, num_hashes=NUM_HASHES, bands=BANDS)
        t = truth.agg(F.count("*").alias("truth_pairs"))
        c = cand.agg(F.count("*").alias("lsh_candidates"))
        h = truth.join(cand, ["a", "b"], "semi").agg(
            F.count("*").alias("hit_pairs"))
        return t.crossJoin(c).crossJoin(h).select(
            "truth_pairs", "lsh_candidates", "hit_pairs",
            F.round(
                F.col("hit_pairs")
                / F.greatest(F.col("truth_pairs"), F.lit(1)),
                6).alias("recall"))
    q["lsh_recall"] = lsh_recall

    def pmi_collocations_top(spark, sf):
        """Top-100 collocations by PMI (Church & Hanks CL'90) over the
        documents corpus, min pair count 20: adjacent pairs co-occurring
        far above their unigram-frequency prediction — boilerplate
        phrase mining / multi-word tokenizer seeds. Sum-of-logs (never
        N^2 — overflows at 10^13 tokens), rounded 6dp, top-k ordered on
        the ROUNDED value + (w1, w2) so the boundary is cross-engine
        stable; TakeOrderedAndProject, no global window."""
        from commoncrawl_spark.operators.analytics import pmi_collocations

        d = _read(spark, sf, "documents")
        return pmi_collocations(d, min_count=20, top_k=100)
    q["pmi_collocations"] = pmi_collocations_top

    def readability(spark, sf):
        """Flesch reading ease + Flesch-Kincaid grade per document
        (Kincaid et al. 1975) from heuristic vowel-run syllables and
        [.!?]-sentences — the classic surface readability pair as a
        quality facet; pure scan-stage Catalyst arrays, zero shuffle,
        exact DuckDB list-lambda twin."""
        from commoncrawl_spark.functions.text import readability_signals

        d = _read(spark, sf, "documents")
        sig = readability_signals(F.col("text"))
        return d.select(
            "doc_id",
            *[sig[k].alias(k) for k in
              ("n_words", "n_sentences", "n_syllables",
               "reading_ease", "fk_grade")])
    q["readability"] = readability

    def near_dedup_pipeline(spark, sf):
        """Composed MinHash near-dedup end to end: LSH buckets ->
        candidate pairs -> exact Jaccard verification -> greedy
        min-id-wins keep set, over the documents+perturbed-twins corpus."""
        from commoncrawl_spark.operators.text_dedup import drop_near_duplicates

        out = drop_near_duplicates(
            _docs2_spark(spark, sf), threshold=0.8,
            num_hashes=NUM_HASHES, bands=BANDS,
        )
        return out.select("doc_id")
    q["near_dedup_pipeline"] = near_dedup_pipeline

    def dedup_clusters_q(spark, sf):
        """Transitive duplicate clusters: LSH candidate pairs -> exact
        Jaccard verification (>= 0.8) -> distributed connected
        components (min-label propagation + pointer doubling) -> every
        document labeled with its component-minimum doc_id. Unlike the
        greedy pairwise keep rule, A~B~C collapses to ONE cluster even
        when A and C never collide in any LSH band."""
        from commoncrawl_spark.operators.graph import dedup_clusters
        from commoncrawl_spark.operators.text_dedup import (
            jaccard_pairs,
            minhash_candidate_pairs,
        )

        d = _docs2_spark(spark, sf)
        cand = minhash_candidate_pairs(d, num_hashes=NUM_HASHES, bands=BANDS)
        verified = jaccard_pairs(d, cand, threshold=0.8).select("a", "b")
        return dedup_clusters(verified, d)
    q["dedup_clusters"] = dedup_clusters_q

    def cluster_reps(spark, sf):
        """Representative election on top of the transitive clusters:
        keep the LONGEST member per near-dup cluster (ties -> smallest
        doc_id) — the FineWeb keep rule, replacing min-id with a
        quality argmax. The doubled corpus makes the winner the
        perturbed (+' zz', one token longer) twin, so the query
        genuinely exercises a non-min-id representative."""
        from commoncrawl_spark.operators.graph import (
            cluster_representatives,
            dedup_clusters,
        )
        from commoncrawl_spark.operators.text_dedup import (
            jaccard_pairs,
            minhash_candidate_pairs,
        )

        d = _docs2_spark(spark, sf)
        cand = minhash_candidate_pairs(d, num_hashes=NUM_HASHES, bands=BANDS)
        verified = jaccard_pairs(d, cand, threshold=0.8).select("a", "b")
        clusters = dedup_clusters(verified, d)
        scores = d.select(
            "doc_id",
            F.size(tokens_col(F.col("text"))).cast("long").alias("score"))
        return cluster_representatives(clusters, scores)
    q["cluster_reps"] = cluster_reps

    def host_pagerank(spark, sf):
        """Crawl-priority PageRank over a deterministic host-link graph
        (two synthetic out-edges per document, 97 hosts). Fixed 3
        iterations, GraphX dangling semantics, so the DuckDB oracle can
        unroll the exact same recurrence as CTEs. Feeds
        select_polite_batch's priority_cols in a real crawl."""
        from commoncrawl_spark.operators.graph import pagerank

        d = _read(spark, sf, "documents").select("doc_id")
        # non-invertible maps (quadratic, and a 97->41 fold) so in-degree
        # is genuinely skewed — an affine map mod 97 would make the graph
        # regular and every rank trivially 1.0
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        r = pagerank(edges, iters=3, damping=0.85)
        return r.select("node", F.round("rank", 6).alias("pr"))
    q["host_pagerank"] = host_pagerank

    def opic_importance(spark, sf):
        """OPIC (Abiteboul et al. WWW'03) batch rounds over a host graph
        WITH dangling hosts (src folded mod 89, dst mod 97: hosts 89-96
        only ever receive) — the online crawl-importance signal: cash
        circulates, history accumulates, dangling cash recycles through
        the virtual page so total importance is exactly 1. Fixed 3
        rounds, recurrence unrolled CTE-for-CTE in the oracle."""
        from commoncrawl_spark.operators.graph import opic

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 89).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 89).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        r = opic(edges, iters=3)
        return r.select(
            "node",
            F.round("cash", 6).alias("cash"),
            F.round("history", 6).alias("history"),
            F.round("importance", 6).alias("importance"),
        )
    q["opic_importance"] = opic_importance

    def hits_scores(spark, sf):
        """HITS hubs/authorities over the same skewed synthetic host
        graph as host_pagerank — the frontier's second link-graph
        priority signal (fetch high-auth hosts first, expand links from
        high-hub hosts first). Fixed 3 iterations, L1 normalization, so
        the DuckDB oracle can unroll the exact recurrence as CTEs."""
        from commoncrawl_spark.operators.graph import hits

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        r = hits(edges, iters=3)
        return r.select(
            "node",
            F.round("hub", 6).alias("hub"),
            F.round("auth", 6).alias("auth"),
        )
    q["hits_scores"] = hits_scores

    def trustrank_hosts(spark, sf):
        """TrustRank (Gyöngyi et al. VLDB'04) over the same skewed
        synthetic host graph as host_pagerank, teleport restricted to
        the vetted seed hosts {0,10,...,90}: the spam-demotion frontier
        signal — hosts near trusted seeds keep score, link farms decay.
        Fixed 3 iterations so the DuckDB oracle unrolls the exact
        recurrence as CTEs."""
        from commoncrawl_spark.operators.graph import trustrank

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        seeds = (
            d.select((F.col("doc_id") % 97).alias("node"))
            .filter(F.col("node") % 10 == 0)
        )
        r = trustrank(edges, seeds, iters=3, damping=0.85)
        return r.select("node", F.round("trust", 6).alias("trust"))
    q["trustrank_hosts"] = trustrank_hosts

    def harmonic_hosts(spark, sf):
        """HyperBall harmonic centrality (Boldi & Vigna ICDM'13 — the
        Common Crawl webgraph ranking metric) over the same skewed
        synthetic host graph: H(v) = Σ 1/d(u,v), balls grown one hop
        per round as mergeable HLL sketches (register-max = set union),
        radius 6. Exact in the sketch's sparse regime at this scale, so
        the DuckDB oracle is an exact recursive-CTE BFS; at web scale
        the same plan degrades to ~1.6% RSE instead of the O(V*E)
        exact-BFS blowup."""
        from commoncrawl_spark.operators.graph import harmonic_centrality

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        r = harmonic_centrality(edges, radius=6)
        return r.select(
            "node", "ball", F.round("harmonic", 6).alias("harmonic"))
    q["harmonic_hosts"] = harmonic_hosts

    def lpa_communities(spark, sf):
        """Deterministic synchronous label propagation (Raghavan et al.
        Phys. Rev. E 2007) over the symmetrized host graph: 4 rounds,
        each node adopting the argmax neighbor label with ties broken
        (count desc, label asc) — mirror rings and link neighborhoods
        fall out as shared labels with no objective to tune. The oracle
        unrolls the same recurrence with QUALIFY row_number per round."""
        from commoncrawl_spark.operators.graph import label_propagation

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        return label_propagation(edges, iters=4)
    q["lpa_communities"] = lpa_communities

    def triangle_hosts(spark, sf):
        """Per-host triangle counts + clustering coefficient over the
        synthetic host graph — the link-farm structural signal
        (near-cliques cluster ~1, organic hubs ~0). Degree-ordered
        wedge generation (Suri & Vassilvitskii WWW'11) bounds
        out-degree by O(sqrt m); the oracle counts each a<b<c triple
        once via the canonical three-way self-join."""
        from commoncrawl_spark.operators.graph import triangle_counts

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        return triangle_counts(edges)
    q["triangle_hosts"] = triangle_hosts

    def ip_asn_lookup(spark, sf):
        """Point-in-interval enrichment (IP -> ASN shape) via the
        binned range join: a naive BETWEEN theta-join plans a
        BroadcastNestedLoopJoin (|P| x |R| touches); binning turns it
        into one hash equi-join on the bin key. Deterministic fake
        IPs from md5(event_id) hex; 25 ASN ranges with 500-wide gaps
        so ~20% of points exercise the left-outer null path."""
        from commoncrawl_spark.operators.ranges import range_lookup_join

        ev = _read(spark, sf, "events")
        pts = ev.select(
            "event_id",
            (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                                1, 4), 16, 10).cast("long") % 62500)
            .alias("ip"))
        rng = _read(spark, sf, "nation").select(
            (F.col("n_nationkey") * 2500).alias("lo"),
            (F.col("n_nationkey") * 2500 + 1999).alias("hi"),
            F.col("n_name").alias("asn"))
        return range_lookup_join(
            pts, rng, "ip", point_id_col="event_id", prefix="r_")
    q["ip_asn_lookup"] = ip_asn_lookup

    def event_funnel(spark, sf):
        """Ordered funnel view->click->signup->purchase: per prefix,
        users completing it in order (each step strictly after the
        earliest completion of the previous). k-1 chained slim joins —
        never a per-user collect_list fold, so a whale user can't pin
        one task."""
        from commoncrawl_spark.operators.analytics import funnel

        ev = _read(spark, sf, "events")
        return funnel(ev, ["view", "click", "signup", "purchase"])
    q["event_funnel"] = event_funnel

    def retention(spark, sf):
        """Weekly retention cohorts over the events log — first-seen
        week x weeks-since matrix with per-cohort rates; the same query
        over a capture log reads as host-liveness retention."""
        from commoncrawl_spark.operators.analytics import retention_cohorts

        ev = _read(spark, sf, "events")
        return retention_cohorts(ev, period_days=7)
    q["retention"] = retention

    def cms_word_counts(spark, sf):
        """Count-min sketch word frequencies: the corpus's token stream
        folds into a fixed 4x256 counter matrix (size INDEPENDENT of
        corpus scale, cellwise-mergeable across snapshots), then every
        distinct word is point-estimated back — est >= truth always,
        within eN/256 w.p. 1-2^-4. md5-derived row hashes so the
        oracle replays the exact matrix."""
        from commoncrawl_spark.operators.analytics import tokens_col
        from commoncrawl_spark.operators.sketches import (
            cms_build, cms_estimate,
        )

        d = _read(spark, sf, "documents")
        words = d.select(
            F.explode(tokens_col(F.col("text"))).alias("word"))
        sk = cms_build(words, "word", depth=4, width=256)
        probes = words.select("word").distinct()
        return cms_estimate(sk, probes, "word", depth=4, width=256)
    q["cms_word_counts"] = cms_word_counts

    def mojibake_repair(spark, sf):
        """Encoding-damage triage + repair: UTF-8-decoded-as-cp1252
        scars (curly quotes, accents, nbsp — several contain C1
        controls) counted and repaired by a longest-first literal
        replace chain, pure whole-stage-codegen. Damage is injected
        deterministically on every third doc so both the scarred and
        clean paths are exercised; n_residue pins that repair consumes
        every known scar."""
        from commoncrawl_spark.functions.text import (
            fix_mojibake_col, mojibake_count_col,
        )

        d = _read(spark, sf, "documents")
        t = F.concat(
            F.substring("text", 1, 120),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(_MOJI_SNIPPET)).otherwise(F.lit("")))
        fixed = fix_mojibake_col(t)
        return d.select(
            "doc_id",
            mojibake_count_col(t).alias("n_scars"),
            F.length(fixed).alias("repaired_len"),
            mojibake_count_col(fixed).alias("n_residue"),
            F.substring(fixed, 1, 160).alias("snippet"))
    q["mojibake_repair"] = mojibake_repair

    def logreg_quality(spark, sf):
        """Trained discriminative quality classifier: full-batch-GD
        logistic regression (8 iterations, lr=4) on three scan-stage
        features (length, token count, 'the'-density) against an
        is-English target — the iterative optimizer the NB module
        docstring once ruled out, made oracle-able by the kmeans
        conventions (1e-6-quantized gradient sums, 6dp rounding every
        iteration). The oracle replays training as 4 unrolled CTE
        rounds and scores with the same literal arithmetic."""
        from commoncrawl_spark.operators.analytics import tokens_col
        from commoncrawl_spark.operators.classify import (
            logreg_scores, logreg_train,
        )

        d = _read(spark, sf, "documents")
        low = F.lower(F.col("text"))
        n_toks = F.size(tokens_col(F.col("text")))
        the_cnt = ((F.length(low)
                    - F.length(F.replace(low, F.lit("the"), F.lit(""))))
                   / 3).cast("long")
        feats = d.select(
            "doc_id",
            F.when(F.col("lang") == "en", F.lit(1.0))
            .otherwise(F.lit(0.0)).alias("y"),
            F.round(F.length("text") / 1000.0, 6).alias("x1"),
            F.round(n_toks / 100.0, 6).alias("x2"),
            F.round(the_cnt * 10.0 / (n_toks + 1.0), 6).alias("x3"))
        w = logreg_train(feats, ["x1", "x2", "x3"], iters=8, lr=4.0)
        return logreg_scores(feats, w, ["x1", "x2", "x3"]).select(
            "doc_id", "y", "p", "pred")
    q["logreg_quality"] = logreg_quality

    def nb_platt_calibration(spark, sf):
        """Platt scaling (Platt 1999) — the production classifier
        stack: the NB posterior log-odds is a good RANKER but a bad
        PROBABILITY, so a logistic regression is trained on a held-out
        bucket to map margin -> calibrated p. NB trains on md5-buckets
        0-3 (de-vs-rest, the corpus's NB target), the calibrator on
        bucket 4, and every doc gets (margin, calibrated p, pred).
        The synthetic langs overlap in NB-margin space at a 14% base
        rate, so the calibrated posterior tops out ~0.27 and pred=0
        everywhere — the BAYES decision, which is exactly what honest
        calibration reports (the hash check rides p). Both trainings
        replay in the oracle: the NB closed form as CTEs, the 8 GD
        rounds unrolled with quantized gradient sums."""
        from commoncrawl_spark.operators.classify import (
            logreg_scores, logreg_train, nb_classify, nb_train,
        )

        d = _read(spark, sf, "documents")
        b = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                1, 8), 16, 10).cast("long") % 5)
        lab = d.select(
            "doc_id", "text", (F.col("lang") == "de").alias("label"),
            b.alias("b"))
        model, priors = nb_train(
            lab.filter(F.col("b") < 4), label_col="label")
        scored = nb_classify(d, model, priors)
        feats = scored.select(
            "doc_id",
            F.round(F.col("score"), 6).alias("x1"),
            F.round(F.col("n_tokens") / 100.0, 6).alias("x2"),
        ).localCheckpoint(eager=True)  # reused 8x by GD + once to score
        calib = (
            feats.join(lab.select("doc_id", "b", "label"), "doc_id")
            .filter(F.col("b") == 4)
            .select(F.col("label").cast("double").alias("y"), "x1", "x2")
        )
        w = logreg_train(calib, ["x1", "x2"], iters=8, lr=4.0)
        return logreg_scores(feats, w, ["x1", "x2"]).select(
            "doc_id", "x1", "p", "pred")
    q["nb_platt_calibration"] = nb_platt_calibration

    def postings_delta(spark, sf):
        """Index compression measurement: gap-encode every posting
        list and cost it as LEB128 varints (Lucene/PISA layout —
        first id absolute, then deltas). Dense stopword postings
        compress hardest; the per-token ratio column quantifies why
        8-byte raw ids are unaffordable at 10^10 docs. Pure array
        expressions on top of the postings build — no extra shuffle."""
        from commoncrawl_spark.operators.index import (
            build_postings, delta_encode_postings,
        )

        d = _read(spark, sf, "documents")
        return delta_encode_postings(build_postings(d)).select(
            "token", "df", "first_id", "bytes_raw", "bytes_delta",
            "ratio")
    q["postings_delta"] = postings_delta

    def degree_histogram(spark, sf):
        """Log-binned in/out-degree histogram over the synthetic host
        graph — the power-law summary webgraph releases publish.
        Bucket = bit_width(degree) - 1: an exact integer floor(log2),
        never float log at power-of-two boundaries."""
        from commoncrawl_spark.operators.graph import degree_distribution

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        return degree_distribution(edges)
    q["degree_histogram"] = degree_histogram

    def reciprocal_links(spark, sf):
        """Per-host link reciprocity over the synthetic host graph —
        link exchanges sit near 1, organic citation near 0. One
        left-semi self-join of the distinct edge list against its own
        swap; counts partial-aggregate on the src key."""
        from commoncrawl_spark.operators.graph import reciprocal_link_stats

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        return reciprocal_link_stats(edges)
    q["reciprocal_links"] = reciprocal_links

    def tokenizer_fertility(spark, sf):
        """Tokenizer fertility by language — BPE-ish pretokens per
        whitespace word, the tokenizer-efficiency metric multilingual
        pipelines budget by (high-fertility languages pay more tokens
        per word). Corpus-level ratio-of-sums per lang plus chars per
        pretoken; one scan, one tiny groupBy."""
        from commoncrawl_spark.functions.text import (
            bpe_token_count_col, token_count_col,
        )

        d = _read(spark, sf, "documents")
        per = d.select(
            "lang",
            token_count_col(F.col("text")).alias("_w"),
            bpe_token_count_col(F.col("text")).alias("_b"),
            F.length("text").alias("_c"))
        return per.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_b").alias("n_pretokens"),
            F.round(F.sum("_b") / F.sum("_w"), 6).alias("fertility"),
            F.round(F.sum("_c") / F.sum("_b"), 6).alias("chars_per_tok"))
    q["tokenizer_fertility"] = tokenizer_fertility

    def stream_enrich(spark, sf):
        """STATELESS streaming enrichment: the binned range join
        (ip_asn_lookup's rewrite) applied inside a real stream — the
        static range side pre-bins and broadcasts, each micro-batch
        bins its points and hash-joins, NO state store and no
        watermark needed (the scale contrast with stream_dedup's keyed
        state). Events arrive as two file-source micro-batches (even
        ids, then odd); the result is the per-ASN count over both,
        NULL asn = gap IPs. Oracle: the same containment join in
        batch SQL."""
        import os
        import tempfile
        import uuid

        ev = _read(spark, sf, "events").select(
            "event_id",
            (F.conv(F.substring(F.md5(F.col("event_id").cast("string")),
                                1, 4), 16, 10).cast("long") % 62500)
            .alias("ip"))
        rng = _read(spark, sf, "nation").select(
            (F.col("n_nationkey") * 2500).alias("lo"),
            (F.col("n_nationkey") * 2500 + 1999).alias("hi"),
            F.col("n_name").alias("asn"))
        binned = F.broadcast(rng.select(
            "lo", "hi", "asn",
            F.explode(F.sequence(F.floor(F.col("lo") / 2500),
                                 F.floor(F.col("hi") / 2500)))
            .alias("_bin")))

        d = tempfile.mkdtemp(prefix="ccs_stream_enrich_")
        src = os.path.join(d, "src")
        parts = [ev.filter(F.col("event_id") % 2 == 0),
                 ev.filter(F.col("event_id") % 2 == 1)]
        for i, part in enumerate(parts):
            bdir = os.path.join(src, f"b{i}")
            part.coalesce(1).write.parquet(bdir)
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    os.utime(os.path.join(bdir, f), (1000 + i, 1000 + i))
        stream = (
            spark.readStream.schema("event_id long, ip long")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        enriched = (
            stream.withColumn("_bin", F.floor(F.col("ip") / 2500))
            .join(binned, "_bin", "left")
            .select(
                "event_id", "ip",
                F.when((F.col("ip") >= F.col("lo"))
                       & (F.col("ip") <= F.col("hi")), F.col("asn"))
                .alias("asn"))
        )
        name = f"ccs_enrich_{uuid.uuid4().hex[:8]}"
        _await_stream(enriched.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", os.path.join(d, "ckpt"))
         .trigger(availableNow=True).start(), 120)
        return (
            spark.table(name)
            .groupBy("asn").agg(F.count("*").alias("n"))
        )
    q["stream_enrich"] = stream_enrich

    def vocab_growth(spark, sf):
        """Heaps'-law vocabulary growth: distinct vocabulary at 10
        id-order corpus prefixes — the sublinear V ~ kN^b curve that
        sizes tokenizer vocabularies and predicts new-vocab yield of
        the next crawl. No global sort: a term joins prefix i iff its
        min-id first occurrence is under the cutoff; cutoffs ride a
        broadcast 10-row frame (bounded fan-out, no window)."""
        from commoncrawl_spark.operators.analytics import (
            vocabulary_growth,
        )

        d = _read(spark, sf, "documents")
        return vocabulary_growth(d, n_points=10)
    q["vocab_growth"] = vocab_growth

    def url_tree(spark, sf):
        """Path-prefix tree rollup over the url_features URL mix — the
        crawl-budget map: URL mass per (host, prefix) to depth 3,
        query strings stripped. Prefixes are a bounded per-row array
        transform (constant fan-out <= depth+1), the only exchange is
        the (host, prefix) count."""
        from commoncrawl_spark.operators.links import url_tree_rollup

        d = _read(spark, sf, "documents")
        url = F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".org"),
            F.when(F.col("doc_id") % 4 == 0, F.lit(""))
            .when(F.col("doc_id") % 4 == 1, F.concat(
                F.lit("/a/b/c/page"), F.col("doc_id").cast("string")))
            .when(F.col("doc_id") % 4 == 2, F.concat(
                F.lit("/item?id="), F.col("doc_id").cast("string"),
                F.lit("&ref=feed&x=1")))
            .otherwise(F.concat(
                F.lit("/p"), (F.col("doc_id") % 7).cast("string"),
                F.lit("/"))),
        )
        return url_tree_rollup(d.select(url.alias("url")))
    q["url_tree"] = url_tree

    def containment_pairs(spark, sf):
        """Exact asymmetric containment join — quote/excerpt detection
        where Jaccard is blind (a short quote inside a long article
        has J near 0, containment 1). Corpus = documents + a 40%-
        leading-words excerpt of every fifth doc (id + 2000000); the
        join must surface every (excerpt -> original) pair at
        containment 1.0. Probe-side rare-first prefixes against the
        full postings stream; exact verify."""
        from commoncrawl_spark.operators.text_dedup import (
            containment_join,
        )

        d = _read(spark, sf, "documents").select("doc_id", "text")
        w = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        k = F.greatest(F.lit(10),
                       F.floor(F.size(w) * 0.4)).cast("int")
        quotes = d.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"),
            F.array_join(F.slice(w, F.lit(1), k), " ").alias("text"))
        return containment_join(
            d.unionByName(quotes), threshold=0.9)
    q["containment_pairs"] = containment_pairs

    def spam_mass_hosts(spark, sf):
        """Relative spam mass (Gyöngyi et al. VLDB'06) over the same
        skewed host graph: the PageRank fraction NOT endorsed by the
        trusted-seed walk — (pr/Σpr − tr/Σtr)/(pr/Σpr), candidates at
        rounded mass >= 0.5. Two fixed-iteration walks over one slim
        edge table + two 1-row broadcast totals; pure composition of
        the pagerank/trustrank operators."""
        from commoncrawl_spark.operators.graph import spam_mass

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        seeds = (
            d.select((F.col("doc_id") % 97).alias("node"))
            .filter(F.col("node") % 10 == 0)
        )
        return spam_mass(edges, seeds, iters=3, damping=0.85,
                         threshold=0.5)
    q["spam_mass_hosts"] = spam_mass_hosts

    def domain_webgraph(spark, sf):
        """The cc-webgraph domain-graph artifact: synthetic host-level
        link edges (every PSL-lite branch exercised — 2-letter ccTLD +
        public 2LD takes three labels, www/e-label prefixes strip,
        bare 2-label hosts pass through) rolled up to registered
        domains, intra-domain navigation dropped, links counted per
        domain pair. Scan-stage rollup + one map-side-partial count."""
        from commoncrawl_spark.operators.links import domain_graph

        d = _read(spark, sf, "documents").select("doc_id", "source")
        m3, m4 = F.col("doc_id") % 3, F.col("doc_id") % 4
        src = (
            F.when(m3 == 0, F.concat(F.col("source"), F.lit(".news.test")))
            .when(m3 == 1, F.concat(F.lit("www."), F.col("source"),
                                    F.lit(".co.uk")))
            .otherwise(F.concat(F.col("source"), F.lit(".org")))
        )
        dst = (
            F.when(m4 == 0, F.concat(F.lit("ext-"),
                                     (F.col("doc_id") % 5).cast("string"),
                                     F.lit(".ac.jp")))
            .when(m4 == 1, F.concat(F.col("source"), F.lit(".co.uk")))
            .when(m4 == 2, F.lit("static.media.net"))
            .otherwise(F.concat(F.lit("en."), F.col("source"),
                                F.lit(".org")))
        )
        return domain_graph(
            d.select(src.alias("src_host"), dst.alias("dst_host")))
    q["domain_webgraph"] = domain_webgraph

    def simhash(spark, sf):
        d = _read(spark, sf, "documents")
        return d.select("doc_id", simhash_col(F.col("text")).alias("simhash"))
    q["simhash"] = simhash

    def simhash_neardup(spark, sf):
        return simhash_near_duplicates(
            _docs2_spark(spark, sf), max_hamming=3, blocks=4
        )
    q["simhash_neardup"] = simhash_neardup

    # ---- similarity search ----

    def embedding_topk(spark, sf):
        e = _read(spark, sf, "embeddings")
        return cosine_topk(e, e.filter(F.col("vec_id") < 10), k=5)
    q["embedding_topk"] = embedding_topk

    def embedding_neardup(spark, sf):
        e = _read(spark, sf, "embeddings")
        return near_duplicate_pairs(e, threshold=0.25, block_col="label")
    q["embedding_neardup"] = embedding_neardup

    def ann_lsh_topk(spark, sf):
        from commoncrawl_spark.operators.similarity import lsh_topk

        e = _read(spark, sf, "embeddings")
        return lsh_topk(e, e.filter(F.col("vec_id") < 10), dim=64, k=5, n_planes=6)
    q["ann_lsh_topk"] = ann_lsh_topk

    def ann_ivf_topk(spark, sf):
        from commoncrawl_spark.operators.similarity import ivf_topk

        e = _read(spark, sf, "embeddings")
        return ivf_topk(e, e.filter(F.col("vec_id") < 10),
                        k=5, n_centroids=16, n_probe=4)
    q["ann_ivf_topk"] = ann_ivf_topk

    def pq_ann_topk(spark, sf):
        """Product-quantization ANN (Jégou et al. TPAMI'11): 64-dim
        vectors compressed to 8 one-byte codes (32x), queries score via
        asymmetric distance — a sum of 8 table lookups, no float vector
        touched at scoring time; the memory scale path for a 10^10
        corpus. Cross-subspace sums ride 1e-6-quantized longs so
        partition order can't perturb the ranking; training-free
        codebook from the first 16 vectors, exactly replayed by the
        oracle."""
        from commoncrawl_spark.operators.similarity import pq_topk

        e = _read(spark, sf, "embeddings")
        return pq_topk(e, e.filter(F.col("vec_id") < 10),
                       k=5, m=8, n_codewords=16)
    q["pq_ann_topk"] = pq_ann_topk

    def ivf_pq_ann(spark, sf):
        """IVF-PQ composed ANN (FAISS ``IVF16,PQ8`` shape): coarse
        inverted lists prune candidates to n_probe/16 of the corpus,
        then PQ byte codes score survivors with 8 table lookups each —
        the compute-and-memory pairing a 10^10-vector deployment uses.
        All-L2 end-to-end, 6dp-rounded with id tie-breaks, ADC on
        1e-6-quantized longs; training-free centroids + codebook from
        the first 16 vectors so the oracle replays the composition."""
        from commoncrawl_spark.operators.similarity import ivf_pq_topk

        e = _read(spark, sf, "embeddings")
        return ivf_pq_topk(e, e.filter(F.col("vec_id") < 10),
                           k=5, m=8, n_codewords=16, n_centroids=16,
                           n_probe=4)
    q["ivf_pq_ann"] = ivf_pq_ann

    def hard_negatives(spark, sf):
        """Hard-negative mining for contrastive training: per anchor,
        the top-5 LSH-bucket neighbors inside the cosine band
        [0.1, 0.35) — informative negatives below the near-dup band
        (the synthetic embeddings are near-orthogonal, so the band sits
        low; the operator's defaults target real encoder geometry).
        Same bucket equi-join as ann_lsh_topk, band filter on the
        6dp-rounded cosine, anchor-partitioned rank window."""
        from commoncrawl_spark.operators.similarity import (
            hard_negative_pairs,
        )

        e = _read(spark, sf, "embeddings")
        return hard_negative_pairs(
            e, e.filter(F.col("vec_id") < 10), dim=64,
            lo=0.1, hi=0.35, k=5, n_planes=6)
    q["hard_negatives"] = hard_negatives

    def diversity_sample_q(spark, sf):
        """Cluster-balanced diversity sampling (DataComp-style
        selection): nearest-centroid assignment over the 16 fixed
        centroids, sqrt-allocation quotas per semantic cell, md5-rank
        deterministic pick inside each cell — hot clusters can't crowd
        out the tail. Pure composition of the audited ivf_assign /
        sqrt_allocation / stratified_sample operators."""
        from commoncrawl_spark.operators.similarity import (
            diversity_sample,
        )

        e = _read(spark, sf, "embeddings")
        return diversity_sample(
            e, e.filter(F.col("vec_id") < 16), total_n=100, seed=42)
    q["diversity_sample"] = diversity_sample_q

    def ann_ivf_kmeans_topk(spark, sf):
        # trained-centroid IVF variant. Fully oracle-checked since r03:
        # kmeans_centroids is deterministic by construction (quantized
        # integer-sum means, 6dp-rounded cosine assignment — see its
        # docstring), so DuckDB replays the training via unrolled
        # iteration CTEs (_sql_kmeans_ivf); quality additionally pinned
        # in tests/test_text_ops.py::test_kmeans_centroids_improve_over_first_k
        from commoncrawl_spark.operators.similarity import (
            ivf_topk,
            kmeans_centroids,
        )

        e = _read(spark, sf, "embeddings")
        cents = kmeans_centroids(e, k=16, n_iters=3)
        return ivf_topk(e, e.filter(F.col("vec_id") < 10),
                        k=5, n_probe=4, centroids=cents)
    q["ann_ivf_kmeans_topk"] = ann_ivf_kmeans_topk

    def ann_recall(spark, sf):
        """Measured ANN accuracy: recall@5 of the IVF path against the
        exact brute-force top-k, per query — the number that justifies
        (or vetoes) the n_probe/K tradeoff before a 10^10-vector
        deployment. Both sides are the existing oracle-checked
        operators; the measurement is one slim (query, neighbor)
        semi-join + a per-query aggregate."""
        from commoncrawl_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )

        e = _read(spark, sf, "embeddings")
        qs_ = e.filter(F.col("vec_id") < 10)
        exact = cosine_topk(e, qs_, k=5).select("query_id", "neighbor_id")
        approx = ivf_topk(e, qs_, k=5, n_centroids=16, n_probe=4).select(
            "query_id", "neighbor_id")
        hits = (
            approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits"))
        )
        return (
            qs_.select(F.col("vec_id").alias("query_id"))
            .join(hits, "query_id", "left")
            .select(
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
                F.round(
                    F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(5.0), 6)
                .alias("recall_at_5"),
            )
        )
    q["ann_recall"] = ann_recall

    def semdedup(spark, sf):
        # SemDeDup (Abbas et al. 2023): cluster-scoped embedding
        # near-dedup; keep the group member FARTHEST from its centroid.
        # Deterministic first-16 centroids (same convention as
        # ann_ivf_topk) so the oracle replays the cell assignment;
        # kmeans_centroids drops in for trained cells.
        from commoncrawl_spark.operators.similarity import semantic_dedup

        e = _read(spark, sf, "embeddings")
        return semantic_dedup(e, n_centroids=16, threshold=0.3)
    q["semdedup"] = semdedup

    # ---- multimodal plumbing ----

    def media_meta(spark, sf):
        from commoncrawl_spark.operators.multimodal import media_meta_cols

        d = _read(spark, sf, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("media")
        )
        return d.select("doc_id", *media_meta_cols("media")).select(
            "doc_id", "n_bytes", "magic_hex"
        )
    q["media_meta"] = media_meta

    def media_decode(spark, sf):
        from commoncrawl_spark.operators.multimodal import decode_media

        d = _read(spark, sf, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("media")
        )
        return decode_media(d)
    q["media_decode"] = media_decode  # deterministic fake decode: rows-only

    def media_resize(spark, sf):
        """Resize plumbing over the binary media column (deterministic
        byte resample standing in for the PIL slot; rows-only like the
        other honest-stub media ops — exact bytes pinned in
        tests/test_text_ops.py)."""
        from commoncrawl_spark.operators.multimodal import resize_media

        d = _read(spark, sf, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("media")
        )
        return resize_media(d, width=16, height=4)
    q["media_resize"] = media_resize  # rows-only (binary transform)

    def media_ahash_neardup(spark, sf):
        """Perceptual-hash image dedup over the binary media column:
        aHash (stride-sample 32 bytes, threshold vs the sample mean —
        the deterministic stand-in for decode+downscale, math identical
        to the PIL drop-in) then Hamming <= 3 pairs via the pigeonhole
        block self-join shared with simhash. Payload bytes never
        shuffle — only (id, int64) signatures."""
        from commoncrawl_spark.operators.multimodal import (
            media_near_duplicates,
        )

        d = _read(spark, sf, "documents").select(
            "doc_id", F.encode("text", "utf-8").alias("media")
        )
        return media_near_duplicates(
            d, max_hamming=3, bits=32, blocks=4)
    q["media_ahash_neardup"] = media_ahash_neardup

    def hll_host_cardinality(spark, sf):
        """Per-host distinct-URL cardinality via mergeable HLL sketches
        (Spark 4 DataSketches): the corpus splits into two deterministic
        'snapshots' (doc_id parity), each builds per-source sketches
        independently, and the merged sketches answer the union distinct
        count WITHOUT rescanning either half — the history-free shape a
        10^10-URL crawl needs (count_distinct over the raw union
        re-shuffles the corpus per question; sketch merge shuffles
        4 KiB/key). At test scale the sketch is in its exact coupon
        regime so distinct_est == exact count deterministically (module
        docstring); the estimation regime's ~1.6% RSE is pinned at 200k
        distinct in tests/test_sketches.py."""
        from commoncrawl_spark.operators.sketches import (
            build_sketches, estimate_cardinality, merge_sketches,
        )

        d = _read(spark, sf, "documents").select("doc_id", "source")
        a = build_sketches(
            d.filter(F.col("doc_id") % 2 == 0), ["source"], "doc_id")
        b = build_sketches(
            d.filter(F.col("doc_id") % 2 == 1), ["source"], "doc_id")
        m = merge_sketches(a, b, key_cols=["source"])
        return estimate_cardinality(m, ["source"])
    q["hll_host_cardinality"] = hll_host_cardinality

    # ---- text normalization ----

    def text_normalize(spark, sf):
        """Pre-tokenization cleanup over a deterministically messied
        rendering of each document (typographic quotes/dashes, NBSP,
        zero-width chars, a control byte, newline runs — every
        normalization pass exercised): strip/fold/collapse via the
        codegen regexp_replace chain, no shuffle, no Python."""
        from commoncrawl_spark.functions.text import normalize_text_col

        d = _read(spark, sf, "documents")
        mtext = F.concat(F.col("text"), F.lit(" "), F.lit(_MESSY_JUNK))
        return d.select(
            "doc_id",
            F.length(mtext).alias("n_before"),
            normalize_text_col(mtext).alias("norm"),
        ).withColumn("n_after", F.length("norm"))
    q["text_normalize"] = text_normalize

    def nfc_normalize_q(spark, sf):
        """Unicode NFC composed with the regexp normalization chain —
        the full CCNet-style pre-tokenization pass. Each document gets
        a deterministic decomposed-Unicode suffix (combining marks,
        singleton compositions) so the NFC pass is actually exercised;
        the pandas UDF is the fifth sanctioned Python site."""
        from commoncrawl_spark.functions.text import (
            nfc_normalize_col,
            normalize_text_col,
        )

        d = _read(spark, sf, "documents")
        mtext = F.concat(F.col("text"), F.lit(" "), F.lit(_NFC_JUNK))
        return d.select(
            "doc_id",
            normalize_text_col(nfc_normalize_col(mtext)).alias("norm"),
        ).withColumn("n_chars", F.length("norm"))
    q["nfc_normalize"] = nfc_normalize_q

    def c4_clean(spark, sf):
        """C4 page cleaning (Raffel et al. 2020 §2.2) over a
        deterministically assembled multi-line page: line-level rules
        (terminal punctuation, ≥3 words, no 'javascript') plus the
        page-level gates (bad word, lorem ipsum, curly brace, <5
        sentences) with first-match drop_reason precedence. Pure
        scan-stage array lambdas — zero exchanges at any corpus size."""
        from commoncrawl_spark.functions.text import c4_signals

        d = _read(spark, sf, "documents")
        m5 = F.col("doc_id") % 5
        variant = (
            F.when(m5 == 0, F.lit(_C4_VARIANTS[0]))
            .when(m5 == 1, F.lit(_C4_VARIANTS[1]))
            .when(m5 == 2, F.lit(_C4_VARIANTS[2]))
            .when(m5 == 3, F.lit(_C4_VARIANTS[3]))
            .otherwise(F.lit(""))
        )
        page = F.concat(F.col("text"), F.lit("."),
                        F.lit(_C4_LINE_JUNK), variant)
        sig = c4_signals(page)
        return d.select(
            "doc_id",
            sig["n_lines"].alias("n_lines"),
            sig["n_kept_lines"].alias("n_kept_lines"),
            sig["n_sentences"].alias("n_sentences"),
            sig["clean_text"].alias("clean_text"),
            sig["keep"].alias("keep"),
            sig["drop_reason"].alias("drop_reason"),
        )
    q["c4_clean"] = c4_clean

    def heavy_hitters_q(spark, sf):
        """Exact phi-frequent tokens via the two-pass Misra-Gries shape
        (per-partition O(k) candidate fold, broadcast-semi exact
        recount): every token with cnt*k >= n over the corpus tokens
        plus a doc_id-salted 97-token rare tail that the sketch must
        survive. Output is partitioning-independent by construction —
        candidates are a guaranteed superset, the integer n/k gate is
        exact."""
        from commoncrawl_spark.operators.analytics import tokens_col
        from commoncrawl_spark.operators.sketches import heavy_hitters

        d = _read(spark, sf, "documents")
        page = F.concat(F.col("text"), F.lit(" tail"),
                        (F.col("doc_id") % 97).cast("string"))
        toks = d.select(tokens_col(page).alias("tokens"))
        return heavy_hitters(toks, "tokens", k=100)
    q["heavy_hitters"] = heavy_hitters_q

    def publication_dates(spark, sf):
        """CC-News-style article dating over synthetic pages where the
        true date and its source are known by construction: OpenGraph >
        meta-date > <time> > JSON-LD > URL /YYYY/MM/DD/ > bare ISO
        text, first CALENDAR-VALID PLAUSIBLE candidate wins (an
        invalid Feb-31 OpenGraph stamp falls through to the URL date,
        which also outranks the bare text date present on the same
        page; a 9999 placeholder yields 'none' — it is itself the
        first bare ISO string in the page, so the text fallback
        correctly re-rejects it). Pure scan-stage regexes."""
        from commoncrawl_spark.functions.extract import publication_date_cols

        d = _read(spark, sf, "documents")
        dd = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
        mm = F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0")
        m7 = F.col("doc_id") % 7
        html = F.concat(
            F.lit("<html><head>"),
            F.when(m7 == 0, F.concat(
                F.lit('<meta property="article:published_time" '
                      'content="2021-'), mm, F.lit("-"), dd,
                F.lit('T12:30:00+00:00">'))).otherwise(F.lit("")),
            F.when(m7 == 1, F.concat(
                F.lit('<meta name="date" content="2020-'), mm, F.lit("-"),
                dd, F.lit('">'))).otherwise(F.lit("")),
            F.when(m7 == 5, F.lit(
                '<meta property="article:published_time" '
                'content="2021-02-31T00:00:00Z">')).otherwise(F.lit("")),
            F.when(m7 == 6, F.lit(
                '<meta property="article:published_time" '
                'content="9999-12-31T00:00:00Z">')).otherwise(F.lit("")),
            F.lit("</head><body>"),
            F.when(m7 == 2, F.concat(
                F.lit('<time datetime="2022-'), mm, F.lit("-"), dd,
                F.lit('T08:00:00">March</time>'))).otherwise(F.lit("")),
            F.when(m7 == 3, F.concat(
                F.lit('<script>{"datePublished": "2023-'), mm,
                F.lit("-"), dd, F.lit('"}</script>'))).otherwise(F.lit("")),
            F.col("text"),
            F.when(m7 == 5, F.concat(
                F.lit(" updated 2019-"), mm, F.lit("-07 by staff."))
                   ).otherwise(F.lit("")),
            F.lit("</body></html>"),
        )
        url = F.concat(
            F.lit("https://"), F.col("source"), F.lit(".org/"),
            F.when(m7 == 4, F.concat(F.lit("2020/"), mm, F.lit("/"), dd,
                                     F.lit("/"))).otherwise(F.lit("")),
            F.when(m7 == 5, F.concat(F.lit("2019/"), mm,
                                     F.lit("/07/"))).otherwise(F.lit("")),
            F.lit("post-"), F.col("doc_id").cast("string"))
        cols = publication_date_cols(html, url)
        return d.select(
            "doc_id",
            cols["pub_date"].alias("pub_date"),
            cols["date_source"].alias("date_source"),
        )
    q["publication_dates"] = publication_dates

    def _feed_fixture(d):
        """Shared RSS/Atom feed frame (feed_url, xml) for the batch
        parse query and the streaming poller twin."""
        from commoncrawl_spark.operators.links import FEED_MONTHS

        sid = F.col("doc_id").cast("string")
        day = (F.col("doc_id") % 28 + 1).cast("string")
        dd = F.lpad(day, 2, "0")
        mon = F.element_at(
            F.array(*[F.lit(m) for m in FEED_MONTHS]),
            (F.col("doc_id") % 12).cast("int") + 1)
        mm = F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0")
        host = F.concat(F.lit("https://"), F.col("source"), F.lit(".org"))
        rss = F.concat(
            F.lit('<rss version="2.0"><channel><title>S</title>'
                  "<item><title>Post "), sid,
            F.lit("</title><link>"), host, F.lit("/a/"), sid,
            F.lit("</link><guid>g-"), sid,
            F.lit("</guid><pubDate>Tue, "), day, F.lit(" "), mon,
            F.lit(" 2021 10:00:00 GMT</pubDate></item>"
                  "<item><title>Second</title><link>"), host,
            F.lit("/b/"), sid,
            F.lit("</link></item>"
                  "<item><title>no link</title></item>"
                  "</channel></rss>"))
        atom = F.concat(
            F.lit("<feed><title>S</title><entry><title>Entry "), sid,
            F.lit('</title><link rel="alternate" href="'), host,
            F.lit("/x/"), sid, F.lit('"/><id>urn:'), sid,
            F.lit("</id><published>2022-"), mm, F.lit("-"), dd,
            F.lit("T08:00:00Z</published></entry>"
                  '<entry><title>Beta</title><link href="'), host,
            F.lit("/y/"), sid,
            F.lit('"/><updated>2023-01-15T00:00:00Z</updated></entry>'
                  "</feed>"))
        return d.select(
            F.concat(host, F.lit("/feed/"), sid).alias("feed_url"),
            F.when(F.col("doc_id") % 2 == 0, rss).otherwise(atom)
            .alias("xml"))

    def feed_entries(spark, sf):
        """RSS/Atom syndication parsing — the news-crawl freshness
        source beside sitemaps: even docs publish an RSS 2.0 feed
        (RFC 822 pubDate, guid, one linkless item that must drop),
        odd docs an Atom feed (ISO published, href links, one entry
        that only has <updated>). Both date dialects normalize to one
        comparable yyyy-MM-dd key; all scan-stage regex + explode."""
        from commoncrawl_spark.operators.links import extract_feed_entries

        return extract_feed_entries(
            _feed_fixture(_read(spark, sf, "documents")))
    q["feed_entries"] = feed_entries


    def epoch_plan_q(spark, sf):
        """Data-constrained training mix: per-source token counts
        (one map-side-partial aggregate) waterfilled against a 60k
        budget under dyadic repetition caps (1/2/4 epochs by source
        ordinal — bulk web repeats least, scarce quality most). The
        breakpoint search is candidate-per-cap aggregates, never a
        global sort; budget lands mid-ladder so low-cap sources
        saturate and cap-4 sources share the uniform level."""
        from commoncrawl_spark.operators.analytics import tokens_col
        from commoncrawl_spark.operators.selection import epoch_plan

        d = _read(spark, sf, "documents")
        st = d.groupBy("source").agg(
            F.sum(F.size(tokens_col(F.col("text"))))
            .cast("long").alias("n_tokens"))
        n = F.regexp_extract("source", r"(\d+)", 1).cast("int")
        st = st.withColumn(
            "max_epochs",
            F.when(n % 3 == 0, F.lit(1.0))
            .when(n % 3 == 1, F.lit(2.0)).otherwise(F.lit(4.0)))
        return epoch_plan(st, 60000.0)
    q["epoch_plan"] = epoch_plan_q

    def hreflang_pairs(spark, sf):
        """Bidirectionally confirmed translation pairs (the hreflang
        validation step that seeds CCMatrix-style bitext mining): each
        doc publishes en/de/fr variants declaring each other, except
        every fifth doc's fr page which declares nothing — so its
        fr pairs must DROP (unreciprocated) while de-en survives.
        Labels come from the opposite page, the direction search
        engines trust. Equi-joins on URL keys, no cartesian."""
        from commoncrawl_spark.operators.links import (
            confirmed_hreflang_pairs,
            extract_hreflang,
        )

        d = _read(spark, sf, "documents")
        b = F.concat(F.lit("https://"), F.col("source"), F.lit(".org/"),
                     F.col("doc_id").cast("string"), F.lit("/"))
        tag = lambda lng: F.concat(  # noqa: E731
            F.lit('<link rel="alternate" hreflang="' + lng + '" href="'),
            b, F.lit(lng + '"/>'))
        full = F.concat(F.lit("<html><head>"), tag("en"), tag("de"),
                        tag("fr"), F.lit("</head></html>"))
        pages = (
            d.select("doc_id", b.alias("_b"), full.alias("_full"))
            .select(
                "doc_id", "_b", "_full",
                F.explode(F.array(F.lit("en"), F.lit("de"), F.lit("fr")))
                .alias("_l"))
            .select(
                F.concat(F.col("_b"), F.col("_l")).alias("url"),
                F.when((F.col("_l") == "fr") & (F.col("doc_id") % 5 == 0),
                       F.lit("<html></html>"))
                .otherwise(F.col("_full")).alias("html"))
        )
        return confirmed_hreflang_pairs(extract_hreflang(pages))
    q["hreflang_pairs"] = hreflang_pairs

    def span_corruption_q(spark, sf):
        """T5 span corruption (Raffel et al. §3.1.4) in the
        deterministic windowed form: one md5-placed 3-token span per
        complete 20-token block swaps for its <extra_id_k> sentinel
        (exactly the 15% T5 rate), targets carry sentinel+span+final
        sentinel, tails pass through. Per-row array lambdas — the
        objective materializes in the scan stage of the export job."""
        from commoncrawl_spark.operators.chunking import span_corruption

        return span_corruption(_read(spark, sf, "documents"))
    q["span_corruption"] = span_corruption_q

    def news_pipeline(spark, sf):
        """The news-crawl composition the feed operators exist for:
        poll feeds (RSS+Atom fixture) -> entry links become frontier
        candidates keyed by sha1(canonical url) -> anti-join the seen
        set (every sixth doc's /a/ link already crawled) -> freshness
        priority (days-to-epoch of the normalized published date,
        dateless entries sink) -> salted per-host politeness batch of
        10. Tie-break on the url string so the whole chain replays in
        SQL; the sha1 key drives only the membership join (injective,
        so raw-url membership is the same set)."""
        from commoncrawl_spark.operators.links import extract_feed_entries
        from commoncrawl_spark.operators.schedule import select_polite_batch
        from commoncrawl_spark.operators.seen_set import (
            anti_join_seen,
            with_url_key,
        )

        ent = feed_entries(spark, sf)
        cand = with_url_key(
            ent.select(F.col("link").alias("url"), "published"))
        d = _read(spark, sf, "documents")
        seen = with_url_key(
            d.filter(F.col("doc_id") % 6 == 0).select(
                F.concat(F.lit("https://"), F.col("source"),
                         F.lit(".org/a/"), F.col("doc_id").cast("string"))
                .alias("url")))
        fresh = (
            anti_join_seen(cand, seen)
            .withColumn("host",
                        F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1))
            .withColumn(
                "staleness",
                F.coalesce(
                    F.datediff(F.lit("2100-01-01").cast("date"),
                               F.col("published").cast("date")),
                    F.lit(99999)).cast("int"))
        )
        batch = select_polite_batch(
            fresh, budget_per_host=10,
            priority_cols=("staleness", "url"), key_col="url_sha1")
        return batch.select("host", "url", "published", "staleness",
                            "host_rank")
    q["news_pipeline"] = news_pipeline

    def host_quality_prior_q(spark, sf):
        """Domain-level reputation from doc-level verdicts: hosts mix
        big (8/10 of docs stay on the source host) and tiny ("-mN"
        satellites, ~2 docs each); keep = n_chars >= 500. Beta-
        binomial shrinkage (m=20 pseudo-docs toward the corpus rate)
        keeps the evidence-free tail neutral while real evidence
        reaches trusted/blocked. One host aggregate + a 1-row global
        broadcast."""
        from commoncrawl_spark.operators.classify import host_quality_prior

        d = _read(spark, sf, "documents")
        row = F.floor(F.col("doc_id") / F.lit(20)).cast("long")
        host = F.when(row % 10 < 8, F.col("source")).otherwise(
            F.concat(F.col("source"), F.lit("-m"),
                     (row % 4).cast("string")))
        return host_quality_prior(
            d.select(host.alias("host"),
                     (F.col("n_chars") >= 500).alias("keep")))
    q["host_quality_prior"] = host_quality_prior_q

    def epoch_stream(spark, sf):
        """epoch_plan made physical: every doc appears floor(epochs)
        times plus an md5-drawn partial-epoch copy, each copy carrying
        its per-epoch shuffle key md5(seed|epoch|id) — the resumable,
        permutation-free training order. Composes the waterfilled plan
        (broadcast, group-cardinality) into the corpus scan."""
        from commoncrawl_spark.operators.selection import materialize_epochs

        plan = epoch_plan_q(spark, sf)
        return materialize_epochs(_read(spark, sf, "documents"), plan)
    q["epoch_stream"] = epoch_stream

    def lang_mismatch(spark, sf):
        """Crawl-QA confusion matrix: the server/page-DECLARED language
        column against the n-gram DETECTED one — mislabeled
        Content-Language headers are endemic and silently poison
        per-language corpora, so the routing decision needs the
        disagreement rate per (declared, detected) cell before anyone
        trusts the label. One map-side-partial aggregate."""
        from commoncrawl_spark.functions.text import language_id_col

        d = _read(spark, sf, "documents")
        return (
            d.groupBy(
                F.col("lang").alias("declared"),
                language_id_col(F.col("text")).alias("detected"))
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .withColumn("agree", F.col("declared") == F.col("detected"))
        )
    q["lang_mismatch"] = lang_mismatch

    def pagination_chains_q(spark, sf):
        """Multi-page article stitching from rel=next declarations:
        each doc publishes a (doc_id%4)+1-page chain; every fiftieth
        doc publishes a 2-page rel=next CYCLE instead, which must
        vanish (a cycle has no head — the desirable trap behavior).
        Single-page docs have no edges and are not chains. Ring-sized
        joins, bounded depth, recursive-CTE oracle."""
        from commoncrawl_spark.operators.links import (
            extract_rel_next,
            pagination_chains,
        )

        d = _read(spark, sf, "documents")
        n_pages = (F.col("doc_id") % 4 + 1).cast("int")
        b = F.concat(F.lit("https://"), F.col("source"), F.lit(".org/a"),
                     F.col("doc_id").cast("string"), F.lit("/pg"))
        cyc = F.col("doc_id") % 50 == 0
        pages = (
            d.select("doc_id", b.alias("_b"),
                     F.when(cyc, F.lit(2)).otherwise(n_pages).alias("_n"))
            .select("doc_id", "_b", "_n",
                    F.explode(F.sequence(F.lit(1), F.col("_n")))
                    .alias("_i"))
            .select(
                F.concat(F.col("_b"), F.col("_i").cast("string"))
                .alias("url"),
                F.when(
                    F.col("_i") < F.col("_n"),
                    F.concat(F.lit('<link rel="next" href="'), F.col("_b"),
                             (F.col("_i") + 1).cast("string"),
                             F.lit('">')))
                .when(
                    (F.col("doc_id") % 50 == 0) & (F.col("_i") == F.col("_n")),
                    F.concat(F.lit('<link rel="next" href="'), F.col("_b"),
                             F.lit('1">')))
                .otherwise(F.lit("<html></html>")).alias("html"))
        )
        return pagination_chains(extract_rel_next(pages), max_pages=10)
    q["pagination_chains"] = pagination_chains_q

    def kmv_vocab_sample(spark, sf):
        """Bottom-k (KMV) sketch per source over its distinct
        vocabulary (plus the salted rare tail): a MERGEABLE fixed-size
        uniform sample of each source's distinct tokens AND the
        (k-1)/u_k distinct-count estimate — the sample HLL cannot
        give. k=16 < per-source vocabulary, so the estimator regime
        (not the exact small-key path) is what the oracle checks.
        Salted two-stage keyed bottom-k; the collect is <= k rows per
        key by construction."""
        from commoncrawl_spark.operators.analytics import tokens_col
        from commoncrawl_spark.operators.sketches import (
            kmv_build,
            kmv_estimate,
        )

        d = _read(spark, sf, "documents")
        page = F.concat(F.col("text"), F.lit(" tail"),
                        (F.col("doc_id") % 97).cast("string"))
        toks = d.select(
            "source", F.explode(tokens_col(page)).alias("tok"))
        sk = kmv_build(toks, ["source"], "tok", k=16)
        est = kmv_estimate(sk, ["source"], k=16)
        return sk.join(est, "source").select(
            "source", "members", "distinct_est", "sample_size")
    q["kmv_vocab_sample"] = kmv_vocab_sample

    def bm25_tombstoned(spark, sf):
        """Index deletes without rewrites: the persisted tf/doclen
        index is built over the FULL corpus, every seventh doc is then
        tombstoned (takedown/dedup), and ranking excludes them via two
        slim LEFT ANTI joins with exact live-corpus statistics — the
        result must equal a from-scratch index of the survivors,
        which is literally what the oracle computes. The posting
        lists are never rewritten."""
        from commoncrawl_spark.operators.index import (
            bm25_search_tombstoned,
            build_doclen,
            build_tf_index,
        )

        d = _read(spark, sf, "documents")
        dead = d.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        return bm25_search_tombstoned(
            build_tf_index(d), build_doclen(d), dead,
            ["join", "hash", "scan"], top_k=15)
    q["bm25_tombstoned"] = bm25_tombstoned

    def merge_plan(spark, sf):
        """LSM/Lucene tiered compaction scheduling over a synthetic
        segment ledger spanning five size-doubling tiers: every full
        group of 4 equals-tier segments (smallest first, id ties)
        becomes one merge task; partial groups wait. Integer tier
        thresholds — float log2 disagrees across engines exactly at
        the power-of-two boundaries this fixture includes."""
        from commoncrawl_spark.tables import plan_tiered_merges

        d = _read(spark, sf, "documents")
        segs = d.select(
            F.concat(F.lit("seg-"), F.col("doc_id").cast("string"))
            .alias("segment_id"),
            (F.lit(1 << 20) * (1 + F.col("doc_id") % 30)
             + F.col("n_chars")).cast("long").alias("bytes"))
        return plan_tiered_merges(segs)
    q["merge_plan"] = merge_plan

    def stream_feed_poll(spark, sf):
        """The feed poller as a REAL stream: feeds re-poll constantly
        and mostly re-serve the same entries, so new-entry detection
        is state, not a batch distinct. Batch 0 polls half the feeds,
        batch 1 re-polls ALL of them (every batch-0 entry reappears
        verbatim); extract_feed_entries runs per micro-batch
        (stateless scan-stage transform) and streaming_first_seen on
        the entry link emits each entry exactly once — a stateless
        engine would emit the batch-0 half twice and fail the row
        count. The oracle is the batch feed extraction (links are
        unique, so first-seen == the full batch result)."""
        import os
        import tempfile
        import uuid

        from commoncrawl_spark.operators.links import extract_feed_entries
        from commoncrawl_spark.streaming.stateful import (
            streaming_first_seen,
        )

        feeds_all = _feed_fixture(_read(spark, sf, "documents"))
        tmp = tempfile.mkdtemp(prefix="ccs_feed_poll_")
        src = os.path.join(tmp, "src")
        half = feeds_all.filter(F.crc32(F.col("feed_url")) % 2 == 0)
        for i, part in enumerate([half, feeds_all]):
            bdir = os.path.join(src, f"b{i}")
            part.coalesce(1).write.parquet(bdir)
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    os.utime(os.path.join(bdir, f), (1000 + i, 1000 + i))
        stream = (
            spark.readStream.schema("feed_url string, xml string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        out = streaming_first_seen(extract_feed_entries(stream), ["link"])
        name = f"ccs_feedpoll_{uuid.uuid4().hex[:8]}"
        _await_stream(out.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .outputMode("append").trigger(availableNow=True).start(), 300)
        return spark.table(name).select(
            "feed_url", "kind", "title", "link", "entry_id",
            "published", "published_raw")
    q["stream_feed_poll"] = stream_feed_poll

    def microdata_stats(spark, sf):
        """schema.org structured-data census — what Common Crawl ships
        as WAT metadata and what rich-result pipelines mine first:
        per page, extract every microdata ``itemtype`` URL and JSON-LD
        ``@type`` value (both regex-reachable without a parser), then
        count pages per normalized type. Fixture plants Article /
        Product / NewsArticle / none variants plus a JSON-LD-only doc;
        types normalize by stripping the schema.org prefix and
        lowercasing. Scan-stage regex + explode + one map-side-partial
        count."""
        d = _read(spark, sf, "documents")
        m4 = F.col("doc_id") % 4
        html = F.concat(
            F.lit("<html><body>"),
            F.when(m4 == 0, F.lit(
                '<div itemscope itemtype="https://schema.org/Article">'
            )).when(m4 == 1, F.lit(
                '<div itemscope itemtype="http://schema.org/Product">'
                '<script>{"@type": "Offer"}</script>'
            )).when(m4 == 2, F.lit(
                '<script type="application/ld+json">'
                '{"@context": "https://schema.org", '
                '"@type": "NewsArticle"}</script>'
            )).otherwise(F.lit("")),
            F.col("text"), F.lit("</body></html>"))
        itemtypes = F.regexp_extract_all(
            html, F.lit(r'(?i)itemtype="https?://schema\.org/([^"]+)"'),
            F.lit(1))
        ldtypes = F.regexp_extract_all(
            html, F.lit(r'"@type"\s*:\s*"([^"]+)"'), F.lit(1))
        types = F.concat(itemtypes, ldtypes)
        return (
            d.select(F.explode(types).alias("t"))
            .groupBy(F.lower(F.col("t")).alias("schema_type"))
            .agg(F.count(F.lit(1)).alias("n_pages"))
        )
    q["microdata_stats"] = microdata_stats

    def partitioned_read(spark, sf):
        """Partition-spec snapshot tables: documents commit twice
        (halves) into a lang-partitioned SnapshotTable, then a
        lang-filtered read must (a) span both commits, (b) prune
        non-matching partition DIRECTORIES at planning time (the
        PartitionFilters pin lives in pytest + SCALE.md), and (c)
        aggregate correctly — which is what the oracle hashes."""
        import tempfile

        from commoncrawl_spark.tables import SnapshotTable

        d = _read(spark, sf, "documents")
        t = SnapshotTable(tempfile.mkdtemp(prefix="ccs_part_"),
                          partition_by=("lang",))
        t.append(d.filter(F.col("doc_id") % 2 == 0))
        t.append(d.filter(F.col("doc_id") % 2 == 1))
        return (
            t.read(spark).filter(F.col("lang") == "en")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("chars"))
        )
    q["partitioned_read"] = partitioned_read

    def coverage_gap(spark, sf):
        """Sitemap-vs-crawl coverage audit — the crawl-ops question
        behind budget reallocation: per host, how many publisher-
        DECLARED URLs (urlset locs) has the crawl never fetched? Each
        doc declares /p/ and /q/ pages; the seen set holds only /p/
        URLs of docs not divisible by 3 — so every /q/ page and every
        third /p/ page is a gap. One LEFT ANTI on the canonical key +
        a host aggregate with the gap share at the 6dp grain."""
        from commoncrawl_spark.operators.links import (
            extract_sitemap_entries,
        )
        from commoncrawl_spark.operators.seen_set import (
            anti_join_seen,
            with_url_key,
        )

        d = _read(spark, sf, "documents")
        sid = F.col("doc_id").cast("string")
        host = F.concat(F.col("source"), F.lit(".org"))
        xml = F.concat(
            F.lit("<urlset><url><loc>https://"), host, F.lit("/p/"), sid,
            F.lit("</loc></url><url><loc>https://"), host, F.lit("/q/"),
            sid, F.lit("</loc></url></urlset>"))
        maps = d.select(
            F.concat(F.lit("https://"), host, F.lit("/sitemap.xml"))
            .alias("sitemap_url"),
            F.encode(xml, "utf-8").alias("xml"))
        declared = with_url_key(
            extract_sitemap_entries(maps).select(F.col("loc").alias("url")))
        seen = with_url_key(
            d.filter(F.col("doc_id") % 3 != 0).select(
                F.concat(F.lit("https://"), host, F.lit("/p/"), sid)
                .alias("url")))
        gaps = anti_join_seen(declared, seen)
        h = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
        per_host = declared.select(h.alias("host")).groupBy("host").agg(
            F.count(F.lit(1)).alias("n_declared"))
        gap_host = gaps.select(h.alias("host")).groupBy("host").agg(
            F.count(F.lit(1)).alias("n_gap"))
        return (
            per_host.join(gap_host, "host", "left")
            .select(
                "host", "n_declared",
                F.coalesce(F.col("n_gap"), F.lit(0)).cast("long")
                .alias("n_gap"))
            .withColumn("gap_share",
                        F.round(F.col("n_gap") / F.col("n_declared"), 6))
        )
    q["coverage_gap"] = coverage_gap

    def stats_pruned_read(spark, sf):
        """Manifest min/max file skipping (the Iceberg manifest-stats
        analog): documents commit range-clustered on n_chars into a
        stats_by table, then a banded read goes through read_pruned —
        the skipping decision is made from the manifest alone, files
        outside the band are never opened (file counts pinned in
        pytest + SCALE.md), and the caller's row filter still applies
        on top (stats pruning is a superset guarantee). The oracle
        hashes the final aggregate."""
        import tempfile

        from commoncrawl_spark.tables import SnapshotTable

        d = _read(spark, sf, "documents")
        t = SnapshotTable(tempfile.mkdtemp(prefix="ccs_stats_"),
                          stats_by=("n_chars",))
        t.overwrite(
            d.repartitionByRange(16, F.col("n_chars"))
            .sortWithinPartitions("n_chars"))
        band = t.read_pruned(spark, {"n_chars": (400, 600)})
        return (
            band.filter(F.col("n_chars").between(400, 600))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("chars"))
        )
    q["stats_pruned_read"] = stats_pruned_read

    def delete_read(spark, sf):
        """Iceberg-v2 equality deletes at the table layer (the
        bm25_tombstoned idea generalized): documents commit once,
        every seventh doc_id lands in a slim delete file, and read()
        applies the merge-on-read anti-join — data files untouched,
        time travel preserved, compaction materializes later. The
        oracle is the plain filtered aggregate."""
        import tempfile

        from commoncrawl_spark.tables import SnapshotTable

        d = _read(spark, sf, "documents")
        t = SnapshotTable(tempfile.mkdtemp(prefix="ccs_del_"))
        t.append(d)
        t.delete_where(
            d.filter(F.col("doc_id") % 7 == 0).select("doc_id"),
            "doc_id")
        return (
            t.read(spark)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("chars"))
        )
    q["delete_read"] = delete_read

    def sq8_ann(spark, sf):
        """FAISS-style SQ8 scalar quantization: per-dim min/max bounds
        (one posexplode pass), uint8 codes via FLOOR (round's halfway
        ties differ across engines), then ASYMMETRIC inner-product
        top-5 — float queries against midpoint-dequantized codes. The
        4x memory cut that decides whether a 10^10-embedding index
        fits executor memory; recall vs the exact ranking is pinned
        in pytest, determinism + arithmetic here."""
        from commoncrawl_spark.operators.similarity import (
            sq8_bounds,
            sq8_encode,
            sq8_topk,
        )

        e = _read(spark, sf, "embeddings")
        b = sq8_bounds(e)
        return sq8_topk(sq8_encode(e, b), b,
                        e.filter(F.col("vec_id") < 10), k=5)
    q["sq8_ann"] = sq8_ann

    def feed_discovery(spark, sf):
        """Feed autodiscovery from page HTML (the rel=alternate
        type=application/*+xml convention every reader implements) —
        the missing edge between crawling pages and polling feeds:
        even docs declare an RSS feed, odd docs Atom, every ninth doc
        declares nothing; a stylesheet link with a feed MIME type is
        planted and must NOT match."""
        from commoncrawl_spark.operators.links import discover_feeds

        d = _read(spark, sf, "documents")
        host = F.concat(F.lit("https://"), F.col("source"), F.lit(".org"))
        sid = F.col("doc_id").cast("string")
        decl = F.when(
            F.col("doc_id") % 9 == 0, F.lit("")
        ).when(F.col("doc_id") % 2 == 0, F.concat(
            F.lit('<link rel="alternate" type="application/rss+xml" '
                  'href="'), host, F.lit("/feed/"), sid, F.lit('"/>'))
        ).otherwise(F.concat(
            F.lit('<link type="application/atom+xml" rel="alternate" '
                  'href="'), host, F.lit("/atom/"), sid, F.lit('"/>')))
        html = F.concat(
            F.lit("<html><head>"), decl,
            F.lit('<link rel="stylesheet" type="application/rss+xml" '
                  'href="/decoy.css">'),
            F.lit("</head><body></body></html>"))
        pages = d.select(
            F.concat(host, F.lit("/p/"), sid).alias("url"),
            html.alias("html"))
        return discover_feeds(pages)
    q["feed_discovery"] = feed_discovery

    def stitched_chains(spark, sf):
        """Pagination chains merged back into single documents — the
        point of chain detection: the rel=next fixture's fragment
        pages (each carrying 'part <i> of doc <id>.') reassemble in
        position order into one trainable text per chain head. Slim
        chain join + a head-keyed aggregate bounded by max_pages."""
        from commoncrawl_spark.operators.links import (
            extract_rel_next,
            pagination_chains,
            stitch_chains,
        )

        d = _read(spark, sf, "documents")
        n_pages = (F.col("doc_id") % 4 + 1).cast("int")
        b = F.concat(F.lit("https://"), F.col("source"), F.lit(".org/a"),
                     F.col("doc_id").cast("string"), F.lit("/pg"))
        cyc = F.col("doc_id") % 50 == 0
        pages = (
            d.select("doc_id", b.alias("_b"),
                     F.when(cyc, F.lit(2)).otherwise(n_pages).alias("_n"))
            .select("doc_id", "_b", "_n",
                    F.explode(F.sequence(F.lit(1), F.col("_n")))
                    .alias("_i"))
            .select(
                F.concat(F.col("_b"), F.col("_i").cast("string"))
                .alias("url"),
                F.when(
                    F.col("_i") < F.col("_n"),
                    F.concat(F.lit('<link rel="next" href="'), F.col("_b"),
                             (F.col("_i") + 1).cast("string"),
                             F.lit('">')))
                .when(cyc & (F.col("_i") == F.col("_n")),
                      F.concat(F.lit('<link rel="next" href="'),
                               F.col("_b"), F.lit('1">')))
                .otherwise(F.lit("<html></html>")).alias("html"),
                F.concat(F.lit("part "), F.col("_i").cast("string"),
                         F.lit(" of doc "), F.col("doc_id").cast("string"),
                         F.lit(".")).alias("text"))
        )
        chains = pagination_chains(extract_rel_next(pages), max_pages=10)
        return stitch_chains(chains, pages)
    q["stitched_chains"] = stitched_chains

    # ---- within-document line dedup ----

    def line_dedup(spark, sf):
        """Within-document repeated-line trim (RefinedWeb-style
        boilerplate removal): each document gets deterministic repeated
        lines (its own text twice more + a unique tail), the operator
        keeps first occurrences in order — pure per-row array
        expressions, zero shuffle."""
        from commoncrawl_spark.operators.text_dedup import (
            dedup_lines_within_doc,
        )

        d = _read(spark, sf, "documents")
        mtext = F.concat_ws(
            "\n", F.col("text"), F.col("text"),
            F.concat(F.lit("tail "), F.col("doc_id").cast("string")),
            F.col("text"))
        return dedup_lines_within_doc(
            d.select("doc_id", mtext.alias("text")))
    q["line_dedup"] = line_dedup

    # ---- incremental near-dedup against a persisted signature index ----

    def near_dedup_incremental(spark, sf):
        """Dedup a NEW crawl segment against the persisted minhash
        signature index of history — history text is never touched
        (signature-estimated Jaccard >= 0.5 is the verification).
        History = doc_id % 3 != 0; the segment = the % 3 == 0 docs plus
        exact re-posts of some history docs under fresh ids. The index
        round-trips through parquet, like a real between-crawls
        snapshot."""
        import tempfile

        from commoncrawl_spark.operators.text_dedup import (
            build_minhash_index,
            near_duplicates_against_index,
        )

        d = _read(spark, sf, "documents").select("doc_id", "text")
        hist = d.filter(F.col("doc_id") % 3 != 0)
        new = d.filter(F.col("doc_id") % 3 == 0).unionByName(
            hist.filter(F.col("doc_id") % 7 == 1).select(
                (F.col("doc_id") + 100000).alias("doc_id"), "text"))
        idx_dir = tempfile.mkdtemp(prefix="ccs_mh_idx_")
        build_minhash_index(hist).write.mode("overwrite").parquet(idx_dir)
        return near_duplicates_against_index(
            new, spark.read.parquet(idx_dir), threshold=0.5)
    q["near_dedup_incremental"] = near_dedup_incremental

    # ---- incremental index maintenance ----

    def bm25_merged(spark, sf):
        """BM25 over an INCREMENTALLY MERGED index: history's tf/doclen
        tables are built and persisted once, a new segment (fresh docs
        plus re-crawls of some history docs with changed text) is
        indexed separately, and merge folds it in with
        new-wins-per-document semantics — the historical corpus is
        never re-tokenized, and the merged index ranks identically to a
        from-scratch rebuild over the merged corpus (which is what the
        oracle computes)."""
        import tempfile

        from commoncrawl_spark.operators.index import (
            bm25_search_indexed,
            build_doclen,
            build_tf_index,
            merge_doclen,
            merge_tf_index,
        )

        d = _read(spark, sf, "documents").select("doc_id", "text")
        hist = d.filter(F.col("doc_id") % 3 != 0)
        new = d.filter(F.col("doc_id") % 3 == 0).unionByName(
            hist.filter(F.col("doc_id") % 10 == 1).select(
                "doc_id",
                F.concat_ws(" ", F.col("text"),
                            F.lit("updated join scan revision"))
                .alias("text")))
        idx_dir = tempfile.mkdtemp(prefix="ccs_bm25_merge_")
        build_tf_index(hist).write.mode("overwrite").parquet(
            f"{idx_dir}/tf")
        build_doclen(hist).write.mode("overwrite").parquet(
            f"{idx_dir}/doclen")
        mtf = merge_tf_index(
            spark.read.parquet(f"{idx_dir}/tf"), build_tf_index(new))
        mdl = merge_doclen(
            spark.read.parquet(f"{idx_dir}/doclen"), build_doclen(new))
        return bm25_search_indexed(
            mtf, mdl, ["join", "hash", "scan"], top_k=15)
    q["bm25_merged"] = bm25_merged

    # ---- corpus-statistics LM quality ----

    def lm_quality(spark, sf):
        """Unigram-LM document scoring: train token frequencies on the
        corpus (one explode+count shuffle), score each document's mean
        log-probability (explode + vocab join + per-doc agg). The
        KenLM-perplexity pipeline stage, exactly expressible in
        Catalyst; higher avg_logprob = more typical text."""
        from commoncrawl_spark.operators.lm import unigram_logprob_scores

        d = _read(spark, sf, "documents")
        return unigram_logprob_scores(d)
    q["lm_quality"] = lm_quality

    def lm_bigram(spark, sf):
        """Conditional bigram scoring (one order up the KenLM ladder):
        per-doc mean ln p(w2|w1) with p = c(w1,w2)/c(w1,.) from the
        corpus bigram table. Token-key shuffles only; AQE broadcasts
        the count tables at real vocabulary sizes."""
        from commoncrawl_spark.operators.lm import bigram_logprob_scores

        d = _read(spark, sf, "documents")
        # broadcast_counts=True: sandbox corpora are caller-known tiny,
        # and _read's bench repartition would make the auto gate's
        # tier-1 probe shuffle the projected text column (Catalyst
        # does not push projects below round-robin exchanges). The
        # auto path is pytest-pinned in test_lm_mirrors.
        return bigram_logprob_scores(d, broadcast_counts=True)
    q["lm_bigram"] = lm_bigram

    def lm_bigram_autogate(spark, sf):
        """lm_bigram with the broadcast gate left on AUTO — the
        production default. Every other lm_* entry passes
        broadcast_counts=True (caller-known-tiny sandbox corpora), so
        without this entry the driver would only ever attest the
        caller-hinted plan; here the gate itself runs — tier-1
        octet-length probe, then materialization of the gate-proven
        model table — and the result must be hash-identical to the
        hinted path (the hint is physical-only). Scores are the same
        conditional bigram means, so the oracle is shared verbatim
        with lm_bigram."""
        from commoncrawl_spark.operators.lm import bigram_logprob_scores

        d = _read(spark, sf, "documents")
        return bigram_logprob_scores(d, broadcast_counts=None)
    q["lm_bigram_autogate"] = lm_bigram_autogate

    def lm_kneser_ney(spark, sf):
        """Interpolated Kneser-Ney bigram scoring (the KenLM smoothing):
        absolute-discounted pair probability backed off to the
        continuation probability N1+(.,w2)/T — self-trained on the
        corpus, mean ln P_KN per document. Same single token-pair
        shuffle as the other LM scorers; the four model tables are
        type-bounded broadcasts."""
        from commoncrawl_spark.operators.lm import kneser_ney_scores

        d = _read(spark, sf, "documents").select("doc_id", "text")
        # broadcast_counts=True: same caller-knowledge rationale as
        # lm_bigram (gate exercised in tests; probe would pay the
        # bench repartition exchange)
        return kneser_ney_scores(d, discount=0.75,
                                 broadcast_counts=True)
    q["lm_kneser_ney"] = lm_kneser_ney

    def stupid_backoff(spark, sf):
        """Stupid Backoff scoring (Brants et al. 2007): train the
        bigram + unigram tables on the even-doc_id half, score the
        WHOLE corpus — unseen bigrams back off to alpha * unigram
        frequency instead of scoring NULL, the cross-segment
        (train-on-trusted, score-the-crawl) shape. Docs containing a
        token outside even the unigram table are true-OOV -> NULL."""
        from commoncrawl_spark.operators.lm import (
            bigram_counts,
            stupid_backoff_scores,
            unigram_counts,
        )

        d = _read(spark, sf, "documents")
        train = d.where(F.col("doc_id") % 2 == 0)
        # broadcast_counts=True: the model derives in-plan from a
        # bounded half-corpus slice the CALLER knows is tiny at every
        # test sf — the library's auto gate would pay a tier-2 exact
        # count that re-derives the model subtree just to learn that
        # (external models have no tier-1 byte bound). The gate's auto
        # path is exercised in test_lm_mirrors; this is the documented
        # explicit-knowledge escape hatch, not an opt-out of safety.
        return stupid_backoff_scores(
            d, counts=bigram_counts(train),
            unigrams=unigram_counts(train), broadcast_counts=True)
    q["stupid_backoff"] = stupid_backoff

    def dsir_weights(spark, sf):
        """DSIR-shaped importance weights (Xie et al. 2023): unigram-LM
        log-ratio between a target corpus (the lang='de' slice) and the
        raw pool (all documents), Laplace-smoothed over the joint
        vocabulary. Higher avg_logratio = more target-like; the
        data-selection signal pretraining pipelines resample by."""
        from commoncrawl_spark.operators.selection import (
            dsir_logratio_scores,
        )

        d = _read(spark, sf, "documents")
        return dsir_logratio_scores(d, d.where(F.col("lang") == "de"))
    q["dsir_weights"] = dsir_weights

    def token_budget_sample(spark, sf):
        """Mixture sampling to per-language token budgets (the
        Pile/Dolma mixing step): md5-deterministic per-doc Bernoulli
        keep with frac = min(1, budget / group_tokens); languages
        without a budget row drop. keep_frac doubles as the importance
        weight for reweighting aggregates back to the full corpus."""
        from commoncrawl_spark.operators.selection import (
            sample_token_budget,
        )

        d = _read(spark, sf, "documents")
        budgets = spark.createDataFrame(
            [("en", 2000), ("de", 100000), ("fr", 500)],
            "lang string, budget_tokens long")
        return sample_token_budget(d, budgets).withColumn(
            "n_tokens", F.col("n_tokens").cast("long"))
    q["token_budget_sample"] = token_budget_sample

    def temperature_mix(spark, sf):
        """Temperature-based mixing (mT5's share^alpha rule) composed
        with the deterministic budget sampler: budgets derive FROM the
        corpus (alpha=0.5 flattening, 30k-token total) instead of
        being hand-picked."""
        from commoncrawl_spark.operators.selection import (
            sample_token_budget,
            temperature_budgets,
        )

        d = _read(spark, sf, "documents")
        budgets = temperature_budgets(d, alpha=0.5, total_budget=30_000)
        return sample_token_budget(d, budgets).withColumn(
            "n_tokens", F.col("n_tokens").cast("long"))
    q["temperature_mix"] = temperature_mix

    def sequence_pack(spark, sf):
        """GPT-style sequence packing: concatenate per-shard token
        streams (1 EOD separator between docs) and slice into 256-token
        training sequences — one row per (doc x sequence it touches)
        with the exact token span and its position in the sequence.
        Deterministic integer arithmetic end-to-end, so the oracle
        replays the running sum + interval intersection exactly."""
        from commoncrawl_spark.operators.chunking import pack_sequences

        d = _read(spark, sf, "documents").select(
            "doc_id", "text",
            (F.col("doc_id") % 8).cast("int").alias("shard"))
        return pack_sequences(d, seq_tokens=256)
    q["sequence_pack"] = sequence_pack

    def weighted_sample(spark, sf):
        """Efraimidis-Spirakis weighted sampling without replacement:
        exactly 100 docs with inclusion probability proportional to
        token count — the resampling step importance-weighted data
        selection runs (plug DSIR weights in for target-likeness
        resampling). Key = ln(md5-uniform)/weight rounded 6dp, top-k
        via orderBy+limit (TakeOrderedAndProject, never a window)."""
        from commoncrawl_spark.functions.text import token_count_col
        from commoncrawl_spark.operators.selection import (
            weighted_sample_k,
        )

        d = _read(spark, sf, "documents").select(
            "doc_id",
            token_count_col(F.col("text")).cast("long").alias("n_tokens"))
        return weighted_sample_k(d, k=100, weight_col="n_tokens")
    q["weighted_sample"] = weighted_sample

    def duplicate_spans(spark, sf):
        """Exact-substring duplication stats (Lee et al. 2021): per
        doc, the token mass covered by 20-token windows appearing >= 2
        times anywhere in the corpus — the ExactSubstr dedup signal.
        Window fingerprints are 32-byte md5 (text never shuffles);
        corpus counts are map-side-partial so boilerplate windows
        collapse before the exchange."""
        from commoncrawl_spark.operators.text_dedup import (
            duplicate_span_stats,
        )

        d = _read(spark, sf, "documents")
        return duplicate_span_stats(d, k=20)
    q["duplicate_spans"] = duplicate_spans

    def exactsubstr_strip(spark, sf):
        """The DESTRUCTIVE ExactSubstr pass (Lee et al. 2021): cut every
        token covered by a 20-token window appearing >= 2 times anywhere
        in the corpus and rebuild each doc from its surviving tokens —
        duplicate_spans is the measurement, this is the removal. Slim
        (id, pos, md5) stream + map-side-partial gram counts; the
        coverage expansion is a per-row zip-shift sliding OR."""
        from commoncrawl_spark.operators.text_dedup import (
            strip_duplicate_spans,
        )

        d = _read(spark, sf, "documents")
        return strip_duplicate_spans(d, k=20, min_count=2)
    q["exactsubstr_strip"] = exactsubstr_strip

    def selection_pipeline(spark, sf):
        """The round-3 selection family composed as one curation job:
        DSIR gate (keep target-like docs, avg_logratio >= 0) ->
        exact-substring duplication gate (dup_fraction <= 0.5,
        computed on the gated subset) -> token-budget mixture
        sampling. Stage order matters and is identical in the oracle;
        every stage is Catalyst — the only shuffles are the two model
        aggregates, the span-gram count, and three slim id semi-joins."""
        from commoncrawl_spark.operators.selection import (
            dsir_logratio_scores,
            sample_token_budget,
        )
        from commoncrawl_spark.operators.text_dedup import (
            duplicate_span_stats,
        )

        d = _read(spark, sf, "documents")
        w = dsir_logratio_scores(d, d.where(F.col("lang") == "de"))
        keep1 = w.where(F.col("avg_logratio") >= 0.0).select("doc_id")
        d1 = d.join(keep1, "doc_id", "left_semi")
        s = duplicate_span_stats(d1, k=20)
        keep2 = s.where(F.col("dup_fraction") <= 0.5).select("doc_id")
        d2 = d1.join(keep2, "doc_id", "left_semi")
        budgets = spark.createDataFrame(
            [("en", 1500), ("de", 100000), ("zh", 400)],
            "lang string, budget_tokens long")
        return sample_token_budget(d2, budgets).withColumn(
            "n_tokens", F.col("n_tokens").cast("long"))
    q["selection_pipeline"] = selection_pipeline

    def winnow_fps(spark, sf):
        """Winnowing fingerprint summary (Schleimer, Wilkerson & Aiken
        2003 — MOSS): per doc, the count/min/max/sum of the distinct
        window-min k-gram hashes. Fingerprinting is pure per-row array
        arithmetic (zero shuffle); only this slim summary aggregates."""
        from commoncrawl_spark.operators.text_dedup import (
            winnow_fingerprints,
        )

        d = _read(spark, sf, "documents")
        fps = winnow_fingerprints(d, k=4, w=8)
        return fps.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.min("fp").alias("fp_min"),
            F.max("fp").alias("fp_max"),
            F.sum("fp").alias("fp_sum"),
        )
    q["winnow_fps"] = winnow_fps

    def winnow_pairs(spark, sf):
        """MOSS match report: document pairs sharing >= 2 winnowing
        fingerprints, with containment overlap. Rare-fingerprint equi
        self-join (ubiquity cap 50) — never all-pairs, never text."""
        from commoncrawl_spark.operators.text_dedup import (
            winnow_overlap_pairs,
        )

        d = _read(spark, sf, "documents")
        return winnow_overlap_pairs(
            d, k=4, w=8, max_docs_per_fp=50, min_shared=2)
    q["winnow_pairs"] = winnow_pairs

    def _nb_split(spark, sf):
        """Shared setup for the NB classifier queries: label = (lang ==
        'de'), 80/20 train/test via the repo's md5-bucket family (the
        same doc never migrates between splits across runs/engines)."""
        d = _read(spark, sf, "documents")
        bucket = (
            F.conv(F.substring(
                F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 5
        )
        lab = d.select(
            "doc_id", "text", (F.col("lang") == "de").alias("label"),
            bucket.alias("_b"))
        return lab.where(F.col("_b") < 4), lab.where(F.col("_b") == 4)

    def nb_classifier_scores(spark, sf):
        """Supervised model-based quality filtering (the GPT-3 /
        LLaMA / FineWeb-Edu stage): multinomial Naive Bayes trained on
        the 80% split (label: lang='de'), scoring the held-out 20% —
        per-doc posterior log-odds + hard prediction."""
        from commoncrawl_spark.operators.classify import (
            nb_classify,
            nb_train,
        )

        train, test = _nb_split(spark, sf)
        model, priors = nb_train(train)
        return nb_classify(test, model, priors)
    q["nb_classifier_scores"] = nb_classifier_scores

    def nb_classifier_eval(spark, sf):
        """Held-out confusion table for the NB quality classifier:
        one row per (label, pred) cell with count and mean posterior
        log-odds — precision/recall/F1 are ratios of these cells."""
        from commoncrawl_spark.operators.classify import (
            nb_classify,
            nb_evaluate,
            nb_train,
        )

        train, test = _nb_split(spark, sf)
        model, priors = nb_train(train)
        scored = nb_classify(test, model, priors)
        return nb_evaluate(scored, test.select("doc_id", "label"))
    q["nb_classifier_eval"] = nb_classifier_eval

    # ---- adaptive recrawl scheduling ----

    def recrawl_priority(spark, sf):
        """Change-rate recrawl scheduling (Cho & Garcia-Molina 2003):
        per URL, estimate the Poisson change rate from digest flips
        across the capture history (lag + single-shuffle agg), then rank
        by P(changed since last capture) as of a cutoff. The freshness
        policy that decides which 10^8 of 10^10 known URLs to refetch
        today."""
        from commoncrawl_spark.operators.temporal import (
            capture_change_stats,
            recrawl_schedule,
        )

        ev = _read(spark, sf, "events")
        caps = ev.select(
            _EV_URL_SPARK().alias("url"),
            "ts",
            "event_id",
            F.md5(F.floor(F.col("value") * 5).cast("string")).alias(
                "digest"),
        )
        stats = capture_change_stats(
            caps, key_col="url", ts_col="ts", digest_col="digest",
            tiebreak_cols=("event_id",))
        sched = recrawl_schedule(stats, "2024-02-01 00:00:00")
        return sched.select(
            "url", "n_captures", "n_changes", "change_rate_per_day",
            "age_days", "p_changed")
    q["recrawl_priority"] = recrawl_priority

    # ---- training-window chunking ----

    def doc_chunks(spark, sf):
        """Fixed-token sliding windows (16 words, stride 8) over every
        document — the pre-training window prep. Pure per-row array
        expressions; one row per chunk with its ordinal and length."""
        from commoncrawl_spark.operators.chunking import chunk_documents

        d = _read(spark, sf, "documents")
        return chunk_documents(d, chunk_tokens=16, stride=8)
    q["doc_chunks"] = doc_chunks

    # ---- benchmark decontamination ----

    def benchmark_contamination(spark, sf):
        """Eval-overlap audit: per document, how many distinct 3-gram
        shingles also occur in the benchmark set (docs with doc_id %
        37 == 0 standing in for an eval suite). The benchmark gram
        table is slim md5 keys (AQE-broadcast); corpus grams semi-join
        against it without shuffling."""
        from commoncrawl_spark.operators.text_dedup import (
            ngram_contamination,
        )

        d = _read(spark, sf, "documents")
        bench = d.filter(F.col("doc_id") % 37 == 0)
        return ngram_contamination(d, bench, n=3)
    q["benchmark_contamination"] = benchmark_contamination

    def decontaminate_strip(spark, sf):
        """SURGICAL decontamination: instead of dropping a whole doc
        that overlaps the eval set (benchmark_contamination's audit),
        cut only the tokens covered by a benchmark 3-gram and rebuild
        the rest — benchmark stand-ins (doc_id % 37 == 0) end up fully
        cut (they ARE the eval text), everything else keeps its clean
        remainder. Broadcast semi-join on slim md5 keys + the shared
        zip-shift coverage/rebuild machinery."""
        from commoncrawl_spark.operators.text_dedup import (
            strip_contaminated_spans,
        )

        d = _read(spark, sf, "documents")
        bench = d.filter(F.col("doc_id") % 37 == 0)
        return strip_contaminated_spans(d, bench, k=3)
    q["decontaminate_strip"] = decontaminate_strip

    def html_quality(spark, sf):
        """Structural HTML quality gates (jusText/Boilerpipe family)
        over synthesized markup: per doc a script block (must not count
        as visible text), a style block, doc_id%4+1 nav links, the doc
        text, and one nested-markup anchor. Pure scan-stage regex —
        tag/link counts, visible length, anchor mass, link density,
        text-to-tag ratio."""
        from commoncrawl_spark.functions.text import html_quality_cols

        d = _read(spark, sf, "documents").select("doc_id", "text")
        m = (F.col("doc_id") % 4 + 1).cast("int")
        html = F.concat(
            F.lit('<html><head><script type="text/javascript">var x = '
                  '"IGNORED TEXT";</script><style>.c{color:red}</style>'
                  "</head><body><nav>"),
            F.repeat(F.lit('<a href="/x">nav item</a>'), m),
            F.lit("</nav><p>"), F.col("text"),
            F.lit('</p><a class="more">Read <b>more</b></a>'
                  "</body></html>"),
        )
        cols = html_quality_cols(html)
        return d.select(
            "doc_id", *[v.alias(k) for k, v in cols.items()])
    q["html_quality"] = html_quality

    def proximity_search_q(spark, sf):
        """Slop-3 ordered proximity over the corpus (the query class
        between exact phrase and boolean AND): docs where slow..hash..
        batch appear in order with every gap <= 4 positions; n_matches
        counts reachable end positions via the existential set fold
        (complete, unlike greedy earliest-next). Token stream filtered
        to the query terms before any shuffle."""
        from commoncrawl_spark.operators.index import proximity_search

        d = _read(spark, sf, "documents").select("doc_id", "text")
        return proximity_search(
            d, ["slow", "hash", "batch"], slop=3)
    q["proximity_search"] = proximity_search_q

    def curation_pipeline_v3(spark, sf):
        """The RefinedWeb-style destructive dedup chain COMPOSED:
        per-host template strip (nav/footer chrome that corpus-global
        dedup never sees) feeding the corpus-wide ExactSubstr cut —
        span duplication is re-measured on the template-stripped text,
        so site chrome can't masquerade as cross-site duplication.
        Same params as the single-stage queries; the oracle nests one
        stage's SQL as the other's source CTE."""
        from commoncrawl_spark.operators.text_dedup import (
            strip_duplicate_spans,
            strip_host_boilerplate,
        )

        d = _read(spark, sf, "documents").select("doc_id", "source", "text")
        hb = strip_host_boilerplate(
            d, host_col="source", seg_words=2, min_docs=3, min_frac=0.1)
        return strip_duplicate_spans(
            hb.select("doc_id", "text"), k=20, min_count=2)
    q["curation_pipeline_v3"] = curation_pipeline_v3

    # ---- per-language quality buckets (CCNet head/middle/tail) ----

    def quality_buckets(spark, sf):
        """CCNet's per-language head/middle/tail split: ntile(3) of the
        quality score within each language, deterministic ties. The
        keep-the-head gate that follows LM scoring in that pipeline."""
        from commoncrawl_spark.operators.analytics import (
            percentile_buckets,
        )

        d = _read(spark, sf, "documents")
        scored = d.select(
            "doc_id", "lang",
            quality_score_col(F.col("text")).alias("quality"))
        return percentile_buckets(scored, "quality", by="lang")
    q["quality_buckets"] = quality_buckets

    # ---- sitemap entry metadata ----

    def sitemap_entries(spark, sf):
        """<urlset> entries with scheduling metadata (lastmod /
        changefreq / priority — the publisher-declared freshness prior
        for recrawl), over synthetic sitemaps whose fields are known by
        construction; missing children must come back null and
        changefreq case-folded."""
        from commoncrawl_spark.operators.links import (
            changefreq_rate_col,
            extract_sitemap_entries,
        )

        d = _read(spark, sf, "documents").select("doc_id", "source")
        freqs = F.array(*[F.lit(x) for x in (
            "always", "HOURLY", "daily", "Weekly", "monthly", "yearly",
            "never")])
        freq = freqs[(F.col("doc_id") % 7).cast("int")]
        xml = F.concat(
            F.lit('<?xml version="1.0"?><urlset><url><loc> https://'),
            F.col("source"), F.lit(".org/p/"),
            F.col("doc_id").cast("string"), F.lit(" </loc>"),
            F.when(F.col("doc_id") % 2 == 0, F.concat(
                F.lit("<lastmod>2024-01-0"),
                (F.col("doc_id") % 9 + 1).cast("string"),
                F.lit("</lastmod>"))).otherwise(F.lit("")),
            F.lit("<changefreq>"), freq, F.lit("</changefreq>"),
            F.when(F.col("doc_id") % 3 != 0, F.concat(
                F.lit("<priority>0."),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("</priority>"))).otherwise(F.lit("")),
            F.lit("</url><url><loc>https://"), F.col("source"),
            F.lit(".org/q/"), F.col("doc_id").cast("string"),
            F.lit("</loc></url></urlset>"),
        )
        sitemaps = d.select(
            F.concat(F.lit("https://"), F.col("source"),
                     F.lit(".org/sitemap/"), F.col("doc_id").cast("string"),
                     F.lit(".xml")).alias("sitemap_url"),
            F.encode(xml, "utf-8").alias("xml"),
        )
        out = extract_sitemap_entries(sitemaps)
        return out.select(
            "sitemap_url", "loc", "lastmod", "changefreq", "priority",
            F.round(changefreq_rate_col(F.col("changefreq")), 6).alias(
                "prior_rate_per_day"),
        )
    q["sitemap_entries"] = sitemap_entries

    # ---- SURT keys ----

    def surt_keys(spark, sf):
        """SURT transform over the synthetic URL fixture (the Common
        Crawl CDX sort key): host labels reversed/comma-joined, )
        separator, lowercased path+query, fragment dropped. Sorting on
        this clusters domains for prefix scans."""
        from commoncrawl_spark.functions.urls import surt_col

        d = _read(spark, sf, "documents")
        url = F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".org/Docs/"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("/"))
            .when(F.col("doc_id") % 3 == 1, F.lit("?Ref=Feed"))
            .otherwise(F.lit("#frag")),
        )
        return d.select("doc_id", surt_col(url).alias("surt"))
    q["surt_keys"] = surt_keys

    # ---- entropy + compression quality signals ----

    def char_entropy(spark, sf):
        """Character-level Shannon entropy per document — the gibberish
        and base64-blob detector. Pure higher-order array expressions,
        no shuffle."""
        from commoncrawl_spark.functions.text import char_entropy_col

        d = _read(spark, sf, "documents")
        return d.select("doc_id",
                        char_entropy_col(F.col("text")).alias("entropy"))
    q["char_entropy"] = char_entropy

    def compression_quality(spark, sf):
        """zlib compression ratio per document (redundancy signal) —
        the sanctioned bytes-level pandas UDF. No SQL oracle (DuckDB
        has no DEFLATE); the exact-value oracle is the shared python
        path pinned in tests/test_text_ops.py."""
        from commoncrawl_spark.functions.text import compression_ratio_col

        d = _read(spark, sf, "documents")
        return d.select(
            "doc_id",
            compression_ratio_col(F.col("text")).alias("compression_ratio"),
        )
    q["compression_quality"] = compression_quality

    # ---- inverted-index retrieval + split assignment ----

    def boolean_search(spark, sf):
        """Conjunctive retrieval through the inverted index: build
        (token, df, doc_ids) postings, prune to the query terms, count
        membership. Same result as the index-free scan (pinned in
        tests); the postings build is the one-time cost."""
        from commoncrawl_spark.operators.index import (
            build_postings,
            search_postings,
        )

        d = _read(spark, sf, "documents")
        return search_postings(build_postings(d),
                               ["join", "hash", "scan"])
    q["boolean_search"] = boolean_search

    def phrase_search_q(spark, sf):
        """Exact consecutive-phrase retrieval ('slow hash batch') via
        positional base-offset intersection — one posexplode filtered
        to the phrase terms, two aggregates, no self-join."""
        from commoncrawl_spark.operators.index import phrase_search

        d = _read(spark, sf, "documents")
        return phrase_search(d, ["slow", "hash", "batch"])
    q["phrase_search"] = phrase_search_q

    def bm25_topk(spark, sf):
        """Okapi BM25 ranked retrieval for ['join','hash','scan'],
        top-15 — the standard lexical ranker over the same postings
        machinery; per-doc accumulation folds in token order so the
        float sum is engine-identical."""
        from commoncrawl_spark.operators.index import bm25_search

        d = _read(spark, sf, "documents")
        return bm25_search(d, ["join", "hash", "scan"], top_k=15)
    q["bm25_topk"] = bm25_topk

    def bm25_indexed(spark, sf):
        """Index-once / search-many BM25: build the (token, doc_id, tf)
        index + doclen table ONCE, persist them as parquet, then rank
        from the persisted tables — the search plan never touches the
        corpus (no re-tokenization; the token IN filter pushes into the
        index scan). Same terms/k as bm25_topk, identical results."""
        import tempfile

        from commoncrawl_spark.operators.index import (
            bm25_search_indexed,
            build_doclen,
            build_tf_index,
        )

        d = _read(spark, sf, "documents")
        idx_dir = tempfile.mkdtemp(prefix="ccs_bm25_idx_")
        build_tf_index(d).write.mode("overwrite").parquet(
            f"{idx_dir}/tf")
        build_doclen(d).write.mode("overwrite").parquet(
            f"{idx_dir}/doclen")
        return bm25_search_indexed(
            spark.read.parquet(f"{idx_dir}/tf"),
            spark.read.parquet(f"{idx_dir}/doclen"),
            ["join", "hash", "scan"],
            top_k=15,
        )
    q["bm25_indexed"] = bm25_indexed

    def phrase_indexed(spark, sf):
        """Phrase retrieval over persisted positional postings — the
        indexed twin of phrase_search: postings built and written once,
        the query reads back only the phrase terms' rows (token filter
        pushes into the parquet scan)."""
        import tempfile

        from commoncrawl_spark.operators.index import (
            build_positional_postings,
            phrase_search_indexed,
        )

        d = _read(spark, sf, "documents")
        idx_dir = tempfile.mkdtemp(prefix="ccs_phrase_idx_")
        build_positional_postings(d).write.mode("overwrite").parquet(
            f"{idx_dir}/pos")
        return phrase_search_indexed(
            spark.read.parquet(f"{idx_dir}/pos"),
            ["slow", "hash", "batch"],
        )
    q["phrase_indexed"] = phrase_indexed

    def ql_topk(spark, sf):
        """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
        Lafferty SIGIR'01) — the language-modeling ranker beside BM25;
        same terms/k as bm25_topk so the two rankings are directly
        comparable (and fusable, see hybrid_rrf). Decomposed-form
        arithmetic with ordered folds, so the oracle hash-matches."""
        from commoncrawl_spark.operators.index import ql_search

        d = _read(spark, sf, "documents")
        return ql_search(d, ["join", "hash", "scan"],
                         mu=1500.0, top_k=15)
    q["ql_topk"] = ql_topk

    def hybrid_rrf(spark, sf):
        """Hybrid search: lexical BM25 top-20 fused with dense
        embedding-cosine top-20 (neighbors of vec 7, vec_id == doc_id)
        via reciprocal-rank fusion (Cormack et al. SIGIR'09) — the
        standard two-ranker hybrid; fusion cost is bounded by the two
        top-k lists, never the corpus."""
        from commoncrawl_spark.operators.index import (
            bm25_search,
            rrf_fuse,
        )

        d = _read(spark, sf, "documents")
        e = _read(spark, sf, "embeddings")
        lex = bm25_search(
            d, ["join", "hash", "scan"], top_k=20
        ).select("doc_id", "rank")
        sem = cosine_topk(
            e, e.filter(F.col("vec_id") == 7), k=20
        ).select(F.col("neighbor_id").alias("doc_id"), "rank")
        return rrf_fuse([lex, sem], rrf_k=60, top_k=15)
    q["hybrid_rrf"] = hybrid_rrf

    def fuzzy_terms(spark, sf):
        """SymSpell symmetric-delete fuzzy matching: corpus vocabulary
        histogram -> delete-1 key equi-join against misspelled query
        terms -> Levenshtein-verified candidates ranked (dist, freq
        desc, term). 'tabel' is the planted transposition: its delete
        keys collide with 'table' but plain Levenshtein is 2, so
        verification must reject it."""
        from commoncrawl_spark.operators.fuzzy import (
            fuzzy_term_candidates,
            vocab_histogram,
        )

        d = _read(spark, sf, "documents")
        return fuzzy_term_candidates(
            vocab_histogram(d),
            ["joind", "hsh", "scann", "tabel", "qury", "batch"],
            spark=spark, top_k=3)
    q["fuzzy_terms"] = fuzzy_terms

    def rm_expansion_q(spark, sf):
        """Pseudo-relevance-feedback expansion (Lavrenko & Croft RM1):
        QL top-10 for ['join','hash'] -> exp-shift doc weights ->
        P(t|R) over the feedback docs, top-12 expansion terms. Every
        float fold is ordered, so the oracle replays it exactly."""
        from commoncrawl_spark.operators.index import rm_expansion

        d = _read(spark, sf, "documents")
        return rm_expansion(d, ["join", "hash"], mu=1500.0,
                            fb_docs=10, fb_terms=12)
    q["rm_expansion"] = rm_expansion_q

    def kwic_snippets_q(spark, sf):
        """Keyword-in-context snippets for ['hash','join'] (width 8,
        first-occurrence anchor) — the search-result display stage;
        pure scan-stage array expressions, zero shuffle."""
        from commoncrawl_spark.operators.index import kwic_snippets

        d = _read(spark, sf, "documents")
        return kwic_snippets(d, ["hash", "join"], width=8)
    q["kwic_snippets"] = kwic_snippets_q

    def bm25f_topk(spark, sf):
        """Field-weighted BM25F (Robertson et al. CIKM'04): title field
        = the document's first 8 tokens at weight 3.0, body = the full
        text at weight 1.0 — weighted tf summed BEFORE saturation, the
        way web search actually scores title/anchor hits. Exact-binary
        weights keep every weighted sum dyadic, so the oracle replays
        the arithmetic bit-for-bit."""
        from commoncrawl_spark.operators.index import bm25f_search

        d = _read(spark, sf, "documents")
        base = d.select(
            "doc_id",
            F.concat_ws(
                " ", F.slice(tokens_col(F.col("text")), 1, 8)
            ).alias("title"),
            F.col("text").alias("body"),
        )
        return bm25f_search(
            base, ["join", "hash", "scan"],
            {"title": 3.0, "body": 1.0}, top_k=15)
    q["bm25f_topk"] = bm25f_topk

    def champion_search(spark, sf):
        """Static index pruning (champion lists, Manning IIR §7.1.3):
        keep only the tf-top-32 postings per term, stamp the TRUE df,
        then BM25 over the pruned lists — query cost O(|query|·m)
        whatever the corpus size. The serving-scale answer to stopword
        posting lists; survivors score EXACTLY as the full index."""
        from commoncrawl_spark.operators.index import (
            bm25_search_champion,
            build_champion_lists,
            build_doclen,
            build_tf_index,
        )

        d = _read(spark, sf, "documents")
        champ = build_champion_lists(
            build_tf_index(d), m=32, salt_buckets=8)
        return bm25_search_champion(
            champ, build_doclen(d), ["join", "hash", "scan"], top_k=15)
    q["champion_search"] = champion_search

    def kcore_hosts(spark, sf):
        """k-core membership of the host graph (Seidman 1983, peeled
        for <= 8 rounds): the densely interlinked center — crawl-budget
        tier / link-farm triage signal beside PageRank. Same synthetic
        host graph as host_pagerank; peeling is confluent, so the
        bounded-round replay is engine-exact."""
        from commoncrawl_spark.operators.graph import kcore

        d = _read(spark, sf, "documents").select("doc_id")
        edges = d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        return kcore(edges, k=9, max_rounds=8)
    q["kcore_hosts"] = kcore_hosts

    def cocitation_hosts(spark, sf):
        """Co-citation host similarity (Small 1973, HITS' A^T A one
        cell at a time): hosts are similar when the same pages link to
        both — "sites like X" without touching content. Pages cite the
        two synthetic hosts of the pagerank graph; hub sources above
        max_out=8 distinct targets are excluded (the quadratic guard),
        pairs need >= 2 co-citing pages, cosine-normalized by citing
        counts."""
        from commoncrawl_spark.operators.links import cocitation

        d = _read(spark, sf, "documents").select("doc_id")
        links = d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * F.col("doc_id") + 1) % 97).alias("dst"),
        ).unionByName(d.select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 17 + 3) % 41).alias("dst"),
        ))
        return cocitation(links, max_out=8, min_count=2)
    q["cocitation_hosts"] = cocitation_hosts

    def corrected_search(spark, sf):
        """Did-you-mean retrieval: SymSpell rank-1 correction of the
        misspelled query ['joind','hsh','scann'] against the corpus
        vocabulary, then BM25 over the corrected term set — the
        correct-then-rank composition, zero driver data (corrections
        feed the tf stream through a broadcast semi-join)."""
        from commoncrawl_spark.operators.fuzzy import corrected_bm25_search

        d = _read(spark, sf, "documents")
        return corrected_bm25_search(
            d, ["joind", "hsh", "scann"], top_k=15)
    q["corrected_search"] = corrected_search

    def champion_recall(spark, sf):
        """Measured pruning quality — ann_recall's twin for the lexical
        index: overlap@15 of champion-pruned BM25 (m=8) against the
        full-index ranking, for the query ['join','hash','scan']. The
        number that sizes m before pruning a 10^10-doc index."""
        from commoncrawl_spark.operators.index import (
            bm25_search_champion,
            bm25_search_indexed,
            build_champion_lists,
            build_doclen,
            build_tf_index,
        )

        d = _read(spark, sf, "documents")
        tfi, dl = build_tf_index(d), build_doclen(d)
        terms = ["join", "hash", "scan"]
        full = bm25_search_indexed(tfi, dl, terms, top_k=15)
        pruned = bm25_search_champion(
            build_champion_lists(tfi, m=8, salt_buckets=8), dl,
            terms, top_k=15)
        return (
            pruned.join(full, "doc_id", "semi")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .select(
                F.lit(15).alias("k"),
                F.lit(8).alias("m"),
                "n_common",
                F.round(F.col("n_common") / F.lit(15.0), 6)
                .alias("recall_at_k"),
            )
        )
    q["champion_recall"] = champion_recall

    def fuzzy_contamination(spark, sf):
        """Fuzzy benchmark decontamination: MinHash-LSH overlap between
        the corpus and a synthetic eval set (every 41st document,
        TRUNCATED to 4/5 of its chars — the paraphrase/truncation case
        exact n-grams miss). Per corpus doc: hit count + max estimated
        Jaccard at threshold 0.5."""
        from commoncrawl_spark.operators.text_dedup import (
            minhash_contamination,
        )

        d = _read(spark, sf, "documents")
        bench = d.filter(F.col("doc_id") % 41 == 0).select(
            "doc_id",
            F.expr("substring(text, 1, (n_chars * 4) div 5)").alias("text"),
        )
        return minhash_contamination(d, bench, threshold=0.5)
    q["fuzzy_contamination"] = fuzzy_contamination

    def mmr_diversify(spark, sf):
        """MMR result diversification (Carbonell & Goldstein SIGIR'98):
        cosine top-20 for query vector 0, greedily re-ranked to 8
        results at lambda 0.75 — near-duplicate hits are pushed down in
        favor of novel ones. The greedy trace is fully 6dp-rounded, so
        the oracle replays it step for step."""
        from commoncrawl_spark.operators.similarity import (
            cosine_topk,
            mmr_rerank,
        )

        e = _read(spark, sf, "embeddings")
        top = cosine_topk(e, e.filter(F.col("vec_id") == 0), k=20)
        cands = (
            top.select(F.col("neighbor_id").alias("vec_id"),
                       F.col("cosine").alias("rel"))
            .join(e.select("vec_id", "embedding"), "vec_id")
        )
        return mmr_rerank(cands, k=8, lam=0.75)
    q["mmr_diversify"] = mmr_diversify

    def pii_cards(spark, sf):
        """Luhn-validated payment-card audit (ISO/IEC 7812): card-
        SHAPED digit runs are extracted by regex, then the mod-10
        checksum separates near-certain PII from ids/order numbers —
        the validation step the email/phone detectors don't need.
        Numbers are planted deterministically (every 29th doc gets a
        valid+invalid pair, every 31st a dashed valid card)."""
        from commoncrawl_spark.functions.text import card_counts_col

        d = _read(spark, sf, "documents")
        planted = (
            F.when(F.col("doc_id") % 29 == 0,
                   F.concat(F.col("text"),
                            F.lit(" card 4532015112830366 and "
                                  "ref 1234567890123")))
            .when(F.col("doc_id") % 31 == 0,
                  F.concat(F.col("text"),
                           F.lit(" pay 4111-1111-1111-1111 now")))
            .otherwise(F.col("text"))
        )
        return (
            d.select("doc_id", card_counts_col(planted).alias("_c"))
            .select("doc_id", "_c.n_card_candidates", "_c.n_cards_valid")
            .filter(F.col("n_card_candidates") > 0)
        )
    q["pii_cards"] = pii_cards

    def split_assign(spark, sf):
        """Deterministic train/val/test assignment: md5(doc_id) bucket
        in [0,100) -> 90/5/5. Same hash family as shard_assign, so the
        split survives re-runs, repartitions, and engines."""
        d = _read(spark, sf, "documents")
        bucket = (
            F.conv(F.substring(
                F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 100
        )
        split = (
            F.when(bucket < 90, F.lit("train"))
            .when(bucket < 95, F.lit("val"))
            .otherwise(F.lit("test"))
        )
        return d.select("doc_id", split.alias("split"))
    q["split_assign"] = split_assign

    # ---- anchor-text aggregation ----

    def anchor_texts(spark, sf):
        """Synthetic pages whose anchors are known by construction ->
        anchor_text_summary. The oracle derives the expected (target,
        anchor) multiset from the same doc_id arithmetic, so any
        mis-parse, mis-resolution, or tag-strip bug breaks the hash."""
        from commoncrawl_spark.operators.links import anchor_text_summary

        d = _read(spark, sf, "documents").select("doc_id", "source", "lang")
        src = F.concat(
            F.lit("https://"), F.col("source"), F.lit(".news.test/"),
            F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
            F.lit("/story"),
        )
        m50 = (F.col("doc_id") % 50).cast("string")
        m7 = (F.col("doc_id") % 7).cast("string")
        html = F.concat(
            F.lit('<html><body><a href="https://ext.test/p/'), m50,
            F.lit('">page '), m50, F.lit("</a>"),
            F.lit('<a href="https://ext.test/p/'), m50, F.lit('">'),
            F.when(F.col("doc_id") % 2 == 0, F.lit("click here"))
            .otherwise(F.concat(F.lit("page "), m50)), F.lit("</a>"),
            F.lit("<a href='/s/"), m7, F.lit("'>s<b>"), m7,
            F.lit("</b></a></body></html>"),
        )
        pages = d.select(src.alias("url"),
                         F.encode(html, "utf-8").alias("html"))
        return anchor_text_summary(pages)
    q["anchor_texts"] = anchor_texts

    def link_locality_stats(spark, sf):
        """Intra vs cross-host linking per source host over pages whose
        edges are known by construction: every doc links out to
        ext.test and internally to /s/...; even docs add one extra
        internal relative link."""
        from commoncrawl_spark.operators.links import link_locality

        d = _read(spark, sf, "documents").select("doc_id", "source", "lang")
        src = F.concat(
            F.lit("https://"), F.col("source"), F.lit(".news.test/"),
            F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
            F.lit("/story"),
        )
        html = F.concat(
            F.lit('<html><body><a href="https://ext.test/p/'),
            (F.col("doc_id") % 50).cast("string"), F.lit('">x</a>'),
            F.lit("<a href='/s/"), (F.col("doc_id") % 7).cast("string"),
            F.lit("'>y</a>"),
            F.when(F.col("doc_id") % 2 == 0, F.concat(
                F.lit('<a href="rel/'),
                (F.col("doc_id") % 3).cast("string"),
                F.lit('.html">z</a>'))).otherwise(F.lit("")),
            F.lit("</body></html>"),
        )
        pages = d.select(src.alias("url"),
                         F.encode(html, "utf-8").alias("html"))
        return link_locality(pages)
    q["link_locality_stats"] = link_locality_stats

    # ---- tf-idf keywords ----

    def tfidf_terms(spark, sf):
        """Per-document keyword extraction: top-3 terms by tf * ln(N/df)
        (textbook tf-idf), deterministic ties. Two map-side-partial
        aggregates + a 1-row broadcast + one window over the doc key."""
        from commoncrawl_spark.operators.analytics import tfidf_top_terms

        d = _read(spark, sf, "documents")
        return tfidf_top_terms(d, k=3)
    q["tfidf_terms"] = tfidf_terms

    # ---- end-to-end training export ----

    def training_export_pipeline(spark, sf):
        """The round-2 stages composed as one export job: unigram-LM
        quality gate (keep avg_logprob >= -3.405, ~top 75%) ->
        benchmark decontamination (3-gram overlap vs the doc_id % 37
        eval stand-in) -> 16-token/stride-8 chunking -> deterministic
        shard assignment on (doc_id, chunk_id). Everything before the
        final projection is Catalyst; the only shuffles are the LM
        count/score aggregates and the two slim id joins."""
        from commoncrawl_spark.operators.chunking import chunk_documents
        from commoncrawl_spark.operators.lm import unigram_logprob_scores
        from commoncrawl_spark.operators.text_dedup import (
            drop_contaminated,
        )

        d = _read(spark, sf, "documents")
        keep = (unigram_logprob_scores(d)
                .filter(F.col("avg_logprob") >= -3.405).select("doc_id"))
        kept = d.join(keep, "doc_id", "left_semi")
        bench = d.filter(F.col("doc_id") % 37 == 0)
        clean = drop_contaminated(kept, bench, n=3)
        chunks = chunk_documents(clean, chunk_tokens=16, stride=8)
        shard = (
            F.conv(F.substring(F.md5(F.concat_ws(
                "#", F.col("doc_id").cast("string"),
                F.col("chunk_id").cast("string"))), 1, 8), 16, 10)
            .cast("long") % 16
        ).cast("int")
        return chunks.select("doc_id", "chunk_id", "n_tokens",
                             shard.alias("shard"))
    q["training_export_pipeline"] = training_export_pipeline

    # ---- shard export assignment ----

    def shard_assign(spark, sf):
        """The export sink's deterministic shard rule (tables.py
        write_shards) as an oracle-checked expression: shard =
        int(md5(key)[0:8], 16) % n — stable across runs, partitionings,
        and engines, so re-exports reproduce shard membership."""
        d = _read(spark, sf, "documents")
        shard = (
            F.conv(F.substring(
                F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 64
        ).cast("int")
        return d.select("doc_id", shard.alias("shard"))
    q["shard_assign"] = shard_assign

    # ---- mixed-language detection ----

    def language_mix(spark, sf):
        """Per-line language composition over a deterministic
        multi-line rendering (stopword-bearing German lines on doc_id %
        3, French on % 5 — code-switched pages both ways): line count,
        distinct languages, dominant language, mixed flag. The CCNet
        drop rule for code-switched documents."""
        from commoncrawl_spark.functions.text import language_mix_stats

        d = _read(spark, sf, "documents")
        l_en = F.lit("the and of to in that")
        l2 = F.when(F.col("doc_id") % 3 == 0,
                    F.lit("der und die das ist von")).otherwise(l_en)
        l3 = F.when(F.col("doc_id") % 5 == 0,
                    F.lit("le la les et de des")).otherwise(
                        F.lit("plain tail line"))
        mtext = F.concat_ws("\n", F.col("text"), l_en, l2, l3)
        return language_mix_stats(d, mtext, keep_cols=["doc_id"])
    q["language_mix"] = language_mix

    # ---- dataset-card report ----

    def corpus_report(spark, sf):
        """The dataset-card numbers a corpus release publishes, as ONE
        single-row aggregate: document/token/char totals, exact-dup
        count (fingerprint groups), language mix, mean quality. One
        pass + one count-distinct — every expression shared with its
        standalone query."""
        d = _read(spark, sf, "documents")
        per_doc = d.select(
            fingerprint_col(F.col("text")).alias("fp"),
            language_id_col(F.col("text")).alias("lang"),
            quality_score_col(F.col("text")).alias("q"),
            token_count_col(F.col("text")).cast("long").alias("nt"),
            F.length("text").cast("long").alias("nc"),
        )
        return per_doc.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("n_unique_docs"),
            F.sum("nt").alias("total_tokens"),
            F.sum("nc").alias("total_chars"),
            F.round(F.avg("q"), 4).alias("mean_quality"),
            F.sum((F.col("lang") == "en").cast("long")).alias("n_en"),
            F.sum((F.col("lang") == "und").cast("long")).alias("n_und"),
        )
    q["corpus_report"] = corpus_report

    def bigram_topk(spark, sf):
        """Corpus-wide top-20 bigrams (the collocation table every
        dataset card shows) from the LM module's pair counts — one pair
        shuffle, deterministic ties."""
        from commoncrawl_spark.operators.lm import bigram_counts

        d = _read(spark, sf, "documents")
        return (bigram_counts(d)
                .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
                .limit(20))
    q["bigram_topk"] = bigram_topk

    def length_histogram(spark, sf):
        """Log2-bucketed document-length histogram (tokens): the
        dataset-card length distribution. bucket = floor(log2(n)) with
        empty docs in bucket -1; one map-side-partial groupBy."""
        d = _read(spark, sf, "documents")
        nt = token_count_col(F.col("text"))
        # explicit null guard: size(null) is -1 only by engine default
        # (legacy sizeOfNull); null text must bucket as NULL like the
        # oracle's len(NULL), not masquerade as an empty doc
        bucket = (
            F.when(F.col("text").isNull(), F.lit(None).cast("int"))
            .when(nt <= 0, F.lit(-1))
            .otherwise(F.floor(F.log2(nt.cast("double"))).cast("int"))
        )
        return (d.select(bucket.alias("bucket"))
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("n_docs")))
    q["length_histogram"] = length_histogram

    # ---- per-host corpus rollup ----

    def host_stats(spark, sf):
        """Per-host corpus health table (what a crawl operator reads
        daily): document count, language mix, mean quality and length.
        One map-side-partial aggregate over scan-stage column
        expressions — the 100 TB corpus reduces to one row per host."""
        d = _read(spark, sf, "documents")
        host = F.concat(F.lit("www."), F.col("source"), F.lit(".org"))
        per_doc = d.select(
            host.alias("host"),
            language_id_col(F.col("text")).alias("lang"),
            quality_score_col(F.col("text")).alias("q"),
            token_count_col(F.col("text")).cast("double").alias("nt"),
        )
        langs = ["en", "de", "fr", "und"]
        return per_doc.groupBy("host").agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[F.sum((F.col("lang") == l).cast("long")).alias(f"n_{l}")
              for l in langs],
            F.round(F.avg("q"), 4).alias("mean_quality"),
            F.round(F.avg("nt"), 4).alias("mean_tokens"),
        )
    q["host_stats"] = host_stats

    # ---- host mirror detection ----

    def mirror_overlap(spark, sf):
        """Bharat-Broder mirror detection: distinct (host, fingerprint)
        -> ubiquity-capped fingerprint self-join -> containment overlap
        per host pair. Fingerprint = md5 of the leading 3-token shingle,
        so cross-host boilerplate collisions actually occur in the
        synthetic corpus; the >50-hosts cap bounds join fan-out at
        web scale."""
        from commoncrawl_spark.operators.mirrors import host_content_overlap

        d = _read(spark, sf, "documents")
        hf = d.select(
            F.concat(F.lit("www."), F.col("source"), F.lit(".org")).alias(
                "host"),
            F.md5(F.concat_ws(
                " ", F.slice(tokens_col(F.col("text")), 1, 3))).alias(
                "fingerprint"),
        )
        return host_content_overlap(hf, max_hosts_per_fp=50)
    q["mirror_overlap"] = mirror_overlap

    # ---- soft-404 detection (crawl QA) ----

    def soft404_content(spark, sf):
        """Content-classifier soft-404 detection (the heuristic-gate
        family, Meneses & Furuta JCDL'11): every 13th doc is rewritten
        as a status-200 error page (templated title + apology body),
        every 13th+5 doc merely MENTIONS an error phrase inside a long
        legitimate body and must survive. Pure scan-stage expressions —
        zero shuffle, zero Python."""
        from commoncrawl_spark.operators.soft404 import detect_soft404

        d = _read(spark, sf, "documents")
        is_err = F.col("doc_id") % 13 == 0
        mentions = F.col("doc_id") % 13 == 5
        title = F.when(
            is_err, F.concat(F.lit("404 Not Found - "), F.col("source"))
        ).otherwise(F.concat(F.lit("Doc "), F.col("doc_id").cast("string")))
        body = F.when(is_err, F.concat(
            F.lit("404 page not found. The page you requested does not "
                  "exist or is no longer available on "),
            F.col("source"), F.lit("."))
        ).when(mentions, F.concat(
            F.lit("some links now answer page not found which is why "),
            F.col("text"))
        ).otherwise(F.col("text"))
        out = detect_soft404(
            d.select("doc_id", title.alias("title"), body.alias("text")))
        return out.select("doc_id", "err_hits", "title_err", "n_tokens",
                          "soft404_score", "is_soft404")
    q["soft404_content"] = soft404_content

    def soft404_probe(spark, sf):
        """Probe-similarity soft-404 detection (Bar-Yossef et al.
        WWW'04 "Sic Transit Gloria Telae"): one known-nonexistent-URL
        probe body per host; a page is the host's error page iff its
        word-shingle Jaccard to the probe is near-identity. Every 17th
        doc serves the host's error template (only the requested path
        differs from the probe); broadcast |hosts|-row join, one
        Jaccard per page, output exactly |pages| rows."""
        from commoncrawl_spark.operators.soft404 import soft404_by_probe

        d = _read(spark, sf, "documents")
        host = F.concat(F.col("source"), F.lit(".probe.test"))
        tmpl = F.concat(
            F.lit("404 page not found. The page you requested does not "
                  "exist on this server or is no longer available. "
                  "Please verify the address you typed and then try "
                  "your request again later. Requested path "))
        body = F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(tmpl, F.lit("/d/"), F.col("doc_id").cast("string"))
        ).otherwise(F.col("text"))
        pages = d.select(
            host.alias("host"),
            F.concat(F.lit("https://"), host, F.lit("/d/"),
                     F.col("doc_id").cast("string")).alias("url"),
            body.alias("text"),
        )
        probes = d.select(host.alias("host")).distinct().select(
            "host", F.concat(tmpl, F.lit("/zz-probe")).alias("probe_text"))
        out = soft404_by_probe(pages, probes, sim_threshold=0.8)
        return out.select("url", "probe_jaccard", "is_soft404")
    q["soft404_probe"] = soft404_probe

    # ---- mergeable quantile-histogram sketch ----

    def quantile_sketch(spark, sf):
        """Mergeable decimal log-histogram quantile sketch (HdrHistogram
        buckets in base 10, DDSketch-style relative-error contract —
        but zero floating-point in the bucket function, so the oracle
        replays it bit-for-bit): events split into two snapshots by
        event_id parity, one bounded-size sketch built per snapshot per
        event_type, merged by bucket-count addition, then p50/p90/p99
        answered from the merged sketch — the history-free percentile
        path beside the HLL distinct-count sketches."""
        from commoncrawl_spark.operators.sketches import (
            hist_build,
            hist_merge,
            hist_quantiles,
        )

        ev = _read(spark, sf, "events")
        a = hist_build(ev.filter(F.col("event_id") % 2 == 0),
                       ["event_type"], "value")
        b = hist_build(ev.filter(F.col("event_id") % 2 == 1),
                       ["event_type"], "value")
        merged = hist_merge(a, b, key_cols=["event_type"])
        return hist_quantiles(merged, ["event_type"], [0.5, 0.9, 0.99])
    q["quantile_sketch"] = quantile_sketch

    # ---- per-IP (server-level) politeness ----

    def ip_politeness(spark, sf):
        """Server-level politeness (Heritrix server queues / IRLbot
        per-server budgets): 40 vhosts resolve onto 8 IPs via the
        md5-prefix stand-in resolver (the DNS seam), and each IP gets a
        budget of 6 slots dealt round-robin-fair across its co-hosted
        vhosts — head-of-line URLs first. Salted two-stage per-IP
        top-k, broadcast |hosts|-row resolution join."""
        from commoncrawl_spark.operators.schedule import (
            resolve_host_ips,
            select_ip_polite_batch,
        )

        d = _read(spark, sf, "documents")
        host = F.concat(F.lit("h"), (F.col("doc_id") % 40).cast("string"),
                        F.lit(".ip.test"))
        f = d.select(
            host.alias("host"),
            F.concat(F.lit("https://"), host, F.lit("/d/"),
                     F.col("doc_id").cast("string")).alias("url"))
        ips = resolve_host_ips(f, n_ips=8)
        out = select_ip_polite_batch(f, ips, budget_per_ip=6)
        return out.select("ip", "host", "url", "host_rank", "ip_rank")
    q["ip_politeness"] = ip_politeness

    # ---- Block-Max pruned retrieval ----

    def blockmax_topk(spark, sf):
        """Block-Max pruned BM25 (Ding & Suel SIGIR'11, range-block
        variant): champion-pass k-th score as the threshold, docID
        regions whose summed per-term block maxima fall below it are
        skipped LOSSLESSLY, survivors scored exactly. The oracle is
        the FULL-index BM25 SQL — equality to the unpruned ranking is
        the property under test."""
        from commoncrawl_spark.operators.index import (
            bm25_search_blockmax,
            build_doclen,
            build_tf_index,
        )

        d = _read(spark, sf, "documents")
        return bm25_search_blockmax(
            build_tf_index(d), build_doclen(d),
            ["join", "hash", "scan"], champion_m=32, block_span=64,
            top_k=15)
    q["blockmax_topk"] = blockmax_topk

    def blockmax_plan(spark, sf):
        """The Block-Max region plan itself: per docID block, the
        query's summed score ceiling and the skip verdict against the
        champion-derived threshold — the metadata table a serving tier
        would consult before touching postings."""
        from commoncrawl_spark.operators.index import (
            blockmax_region_plan,
            bm25_search_champion,
            build_block_max,
            build_champion_lists,
            build_doclen,
            build_tf_index,
        )

        d = _read(spark, sf, "documents")
        tf, dl = build_tf_index(d), build_doclen(d)
        ctop = bm25_search_champion(
            build_champion_lists(tf, m=32, salt_buckets=8), dl,
            ["join", "hash", "scan"], top_k=15)
        theta = ctop.agg(
            F.when(F.count(F.lit(1)) >= 15, F.min("score"))
            .otherwise(F.lit(float("-inf"))).alias("theta"))
        return blockmax_region_plan(
            build_block_max(tf, dl, block_span=64),
            ["join", "hash", "scan"], theta)
    q["blockmax_plan"] = blockmax_plan

    # ---- robots / politeness compliance audit ----

    def robots_compliance(spark, sf):
        """Post-hoc crawler compliance report: every 7th fetch hits a
        robots-disallowed path (prefix rule on even hosts, wildcard on
        odd), and every 4th fetch per host arrives 1s after its
        predecessor — under the even hosts' declared Crawl-delay. The
        audit parses the REAL robots bodies through the Catalyst
        parser, joins the |hosts|-row rules broadcast, and rolls up
        violations per host."""
        from commoncrawl_spark.operators.schedule import (
            parse_robots_txt,
            robots_compliance_audit,
        )

        d = _read(spark, sf, "documents")
        h = F.col("doc_id") % 10
        host = F.concat(F.lit("h"), h.cast("string"), F.lit(".rc.test"))
        i = (F.col("doc_id") / 10).cast("long")
        log = d.select(
            host.alias("host"),
            F.concat(
                F.lit("https://"), host,
                F.when(F.col("doc_id") % 7 == 0, F.lit("/private/p"))
                .otherwise(F.lit("/page/p")),
                F.col("doc_id").cast("string")).alias("url"),
            (i * 5 - F.when(i % 4 == 3, F.lit(4)).otherwise(F.lit(0)))
            .cast("double").alias("fetched_at"),
        )
        robots = parse_robots_txt(
            d.select(host.alias("host")).distinct().select(
                "host",
                F.when(
                    F.substring(F.col("host"), 2, 1).cast("int") % 2 == 0,
                    F.concat(
                        F.lit("User-agent: *\nDisallow: /private\n"
                              "Crawl-delay: "),
                        (F.lit(2)
                         + (F.substring(F.col("host"), 2, 1).cast("int")
                            / 2).cast("int") % 3).cast("string")))
                .otherwise(F.lit("User-agent: *\nDisallow: /priv*"))
                .alias("robots_txt")))
        return robots_compliance_audit(log, robots)
    q["robots_compliance"] = robots_compliance

    def size_drift_sketch(spark, sf):
        """The question the quantile sketches exist for: per-key
        distribution DRIFT between snapshots without rescanning either
        — p50/p99 of event value per event_type from the old
        snapshot's sketch vs the new one's, delta reported. Both
        inputs are the bounded per-snapshot bucket tables; the corpus
        is touched once per snapshot at build time (the
        snapshot_term_drift counterpart for the numeric facet)."""
        from commoncrawl_spark.operators.sketches import (
            hist_build,
            hist_quantiles,
        )

        ev = _read(spark, sf, "events")
        n = ev.count()
        old = hist_build(ev.filter(F.col("event_id") < n / 2),
                         ["event_type"], "value")
        new = hist_build(ev.filter(F.col("event_id") >= n / 2),
                         ["event_type"], "value")
        qo = hist_quantiles(old, ["event_type"], [0.5, 0.99]).select(
            "event_type", "q", F.col("est").alias("est_old"))
        qn = hist_quantiles(new, ["event_type"], [0.5, 0.99]).select(
            "event_type", "q", F.col("est").alias("est_new"))
        return qo.join(qn, ["event_type", "q"]).select(
            "event_type", "q", "est_old", "est_new",
            F.round(F.col("est_new") - F.col("est_old"), 6)
            .alias("drift"))
    q["size_drift_sketch"] = size_drift_sketch

    def bloom_point_read(spark, sf):
        """Manifest Bloom filters (the Iceberg Puffin / Parquet
        column-bloom analog): documents commit in two batches with a
        per-file Bloom over the synthesized url; equality point
        lookups then open only admitted files — the "did we ever
        crawl url X?" path where min/max stats admit everything on a
        high-cardinality key. Three planted lookups (one per commit +
        one absent) unioned; the absent key must return nothing even
        when a filter false-positives a file open. Oracle = the plain
        filtered rows (superset guarantee + exact row predicate)."""
        import tempfile

        from commoncrawl_spark.tables import SnapshotTable

        d = _read(spark, sf, "documents")
        url = F.concat(F.lit("https://h"),
                       (F.col("doc_id") % 23).cast("string"),
                       F.lit(".bp.test/d/"),
                       F.col("doc_id").cast("string"))
        rows = d.select(url.alias("url"), "doc_id", "lang")
        t = SnapshotTable(tempfile.mkdtemp(prefix="ccs_bloom_"),
                          bloom_by=("url",))
        t.append(rows.filter(F.col("doc_id") % 2 == 0).repartition(4))
        t.append(rows.filter(F.col("doc_id") % 2 == 1).repartition(4))
        probes = ["https://h8.bp.test/d/100",
                  "https://h10.bp.test/d/33",
                  "https://absent.bp.test/d/1"]
        out = t.read_point(spark, "url", probes[0])
        for p in probes[1:]:
            out = out.unionByName(t.read_point(spark, "url", p))
        return out.select("url", "doc_id", "lang")
    q["bloom_point_read"] = bloom_point_read

    def percolate_alerts(spark, sf):
        """Inverse search / percolation (the news-alert shape): six
        standing term queries matched against every document —
        conjunctive hits only. Inverted evaluation: distinct doc
        tokens equi-join the exploded query-term table, count-vs-size
        per (doc, query) — never a broadcast CNF, never a cartesian."""
        from pyspark.sql import Row

        from commoncrawl_spark.operators.index import percolate

        d = _read(spark, sf, "documents")
        qs = spark.createDataFrame([
            Row(query_id="q_joinhash", terms=["join", "hash"]),
            Row(query_id="q_scan", terms=["scan"]),
            Row(query_id="q_triple", terms=["table", "row", "value"]),
            Row(query_id="q_dup", terms=["batch", "batch", "slow"]),
            Row(query_id="q_miss", terms=["join", "zzzz"]),
            Row(query_id="q_none", terms=["qqqq"]),
        ])
        return percolate(d, qs, mode="all")
    q["percolate_alerts"] = percolate_alerts

    def stream_percolate(spark, sf):
        """Percolation as a REAL stream — the alerting deployment
        shape: documents arrive in two file-source micro-batches
        (split by doc_id parity) and the standing queries evaluate per
        batch via foreachBatch. Percolation is per-document, so the
        union of per-batch matches equals whole-corpus percolation
        EXACTLY — the oracle is the batch percolate SQL."""
        import os
        import tempfile

        from pyspark.sql import Row

        from commoncrawl_spark.operators.index import percolate

        d = _read(spark, sf, "documents").select("doc_id", "text")
        tmp = tempfile.mkdtemp(prefix="ccs_perc_stream_")
        src = os.path.join(tmp, "src")
        for i in range(2):
            bdir = os.path.join(src, f"b{i}")
            d.filter(F.col("doc_id") % 2 == i).coalesce(1) \
                .write.parquet(bdir)
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    os.utime(os.path.join(bdir, f),
                             (1000 + i, 1000 + i))
        qs = spark.createDataFrame([
            Row(query_id="q_joinhash", terms=["join", "hash"]),
            Row(query_id="q_scan", terms=["scan"]),
            Row(query_id="q_triple", terms=["table", "row", "value"]),
            Row(query_id="q_dup", terms=["batch", "batch", "slow"]),
            Row(query_id="q_miss", terms=["join", "zzzz"]),
            Row(query_id="q_none", terms=["qqqq"]),
        ])
        outdir = os.path.join(tmp, "hits")

        def sink(bdf, _bid):
            percolate(bdf, qs).write.mode("append").parquet(outdir)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(src)
        )
        _await_stream(stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True).start(), 300)
        return spark.read.parquet(outdir).select(
            "doc_id", "query_id", "n_matched", "n_terms")
    q["stream_percolate"] = stream_percolate

    def schema_evolution_read(spark, sf):
        """Iceberg add-column schema evolution at the table layer: the
        second commit carries a column the first never had; read()
        reconciles (old rows null), and the aggregate proves both the
        merged schema and the null semantics. Oracle = the same
        aggregate with the nulls made explicit."""
        import tempfile

        from commoncrawl_spark.tables import SnapshotTable

        d = _read(spark, sf, "documents")
        t = SnapshotTable(tempfile.mkdtemp(prefix="ccs_se_"))
        t.append(d.filter(F.col("doc_id") % 2 == 0)
                 .select("doc_id", "lang"))
        t.append(d.filter(F.col("doc_id") % 2 == 1)
                 .select("doc_id", "lang", "n_chars"))
        return (
            t.read(spark)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count("n_chars").alias("n_with_chars"),
                 F.sum("n_chars").cast("long").alias("chars"))
        )
    q["schema_evolution_read"] = schema_evolution_read

    def kmv_set_ops(spark, sf):
        """KMV set algebra (Beyer et al. SIGMOD'07) — the question HLL
        cannot answer: per event_type, the Jaccard / intersection /
        union cardinalities of the even-batch vs odd-batch distinct
        user sets, from two k=16 blobs alone — "how many users do two
        crawl snapshots share" without joining the underlying sets.
        At the driver gate's sf0.01 (and above), per-type distinct
        users exceed k=16, so the estimator regime is what the oracle
        checks there; at sf0.001 the halves hold exactly 15 users per
        type and the exact small-set branch runs instead."""
        from commoncrawl_spark.operators.sketches import (
            kmv_build,
            kmv_set_estimates,
        )

        ev = _read(spark, sf, "events")
        a = kmv_build(ev.filter(F.col("event_id") % 2 == 0),
                      ["event_type"], "user_id", k=16)
        b = kmv_build(ev.filter(F.col("event_id") % 2 == 1),
                      ["event_type"], "user_id", k=16)
        return kmv_set_estimates(a, b, ["event_type"], k=16)
    q["kmv_set_ops"] = kmv_set_ops

    # ---- unigram-LM tokenizer (SentencePiece's default algorithm) ----

    def unigram_seed(spark, sf):
        """Unigram-tokenizer seed vocabulary (Kudo ACL'18 step 1):
        occurrence-weighted substring counts over the word histogram,
        top-20 multi-char pieces plus every character (coverage).
        Histogram-sized after the one corpus tokenize pass; bounded
        global top-k."""
        from commoncrawl_spark.operators.unigram import (
            seed_vocab,
            word_histogram,
        )

        d = _read(spark, sf, "documents")
        return seed_vocab(word_histogram(d), max_piece_len=4,
                          seed_size=20)
    q["unigram_seed"] = unigram_seed

    def unigram_vocab(spark, sf):
        """Unigram-tokenizer training: one deterministic hard-EM round
        — Viterbi-segment every DISTINCT word under the seed log-probs
        (ties: fewer pieces, then lex piece sequence), recount pieces
        with integer word frequencies, char floor for coverage. The
        oracle replays the whole round, Viterbi DP included, as
        unrolled position CTEs."""
        from commoncrawl_spark.operators.unigram import (
            seed_vocab,
            train_unigram,
            word_histogram,
        )

        d = _read(spark, sf, "documents")
        h = word_histogram(d)
        return train_unigram(h, seed_vocab(h, max_piece_len=4,
                                           seed_size=20),
                             n_iter=1, max_piece_len=4)
    q["unigram_vocab"] = unigram_vocab

    def unigram_tokens(spark, sf):
        """Corpus encoding under the trained unigram vocabulary:
        per-doc piece and word counts — the fertility table a
        pretraining budget reads. Distinct words segment once through
        the shared Python kernel; docs aggregate JVM-side."""
        from commoncrawl_spark.operators.unigram import (
            seed_vocab,
            train_unigram,
            unigram_token_counts,
            word_histogram,
        )

        d = _read(spark, sf, "documents")
        h = word_histogram(d)
        v = train_unigram(h, seed_vocab(h, max_piece_len=4,
                                        seed_size=20),
                          n_iter=1, max_piece_len=4)
        return unigram_token_counts(d, v, max_piece_len=4)
    q["unigram_tokens"] = unigram_tokens

    # ---- full pipeline (non-SQL-expressible: pandas-UDF extraction) ----
    q["crawl_pipeline"] = _crawl_pipeline

    # Driver-attestation ordering: the correctness driver records rows
    # for only the FIRST 50 entries in dict insertion order (proven in
    # round 2: CORRECTNESS_r02 keys == list(queries())[:50]). Entries
    # with no driver row yet — the round-2 surface plus everything new
    # this round — go FIRST so the next driver run attests them; the
    # queries already attested in CORRECTNESS_r01/r02 keep those files
    # as their permanent record and follow after.
    # ROUND-4 ROTATION (executed): the list below is 50 never-attested
    # queries (each with a full DuckDB oracle), per the round-3 verdict's
    # priority order — flagship curation/LM/ANN/graph operators, the
    # table-layer reads, the frontier composites the engine exists for,
    # and the ninth-session adds flagged in ADVICE.md. Everything in
    # round 3's list keeps CORRECTNESS_r03 as its permanent record.
    # ROUND-5 ROTATION (pre-staged — swap _front to this list before the
    # round-5 driver run; 94 queries remain unattested after r4, the
    # driver caps at 50/round, so the 44 left over are the long-tail
    # diagnostics, deliberately lowest-priority). All 50 below were
    # re-verified hash-green under scripts/check_contract.py at the end
    # of round 4 (late-r4 engine), so the swap is mechanical:
    #   warc_cdx, wet_export, warc_export, wat_export, cdx_zipnum,
    #   warc_revisit, redirect_resolution, mime_sniff, page_directives,
    #   dust_param_rules, dust_collapse, alias_collapse, url_word_filter,
    #   aimd_rates, opic_importance, host_traps, stratified_sample,
    #   revalidation_bandwidth, seed_depth_rings, fetch_timetable,
    #   host_shard_ring, lpa_communities, harmonic_hosts,
    #   cocitation_hosts, domain_webgraph, degree_histogram,
    #   reciprocal_links, logreg_quality, nb_platt_calibration,
    #   ssjoin_pairs, containment_pairs, lsh_recall, embedding_outliers,
    #   hard_negatives, diversity_sample, mmr_diversify,
    #   media_ahash_neardup, hll_host_cardinality, fuzzy_contamination,
    #   champion_search, champion_recall, corrected_search, fuzzy_terms,
    #   rm_expansion, kwic_snippets, proximity_search, html_quality,
    #   sequence_pack, temperature_mix, pii_cards
    # ROUND-6 ROTATION (pre-staged — swap _front to this list before
    # any round-6 driver run; it is the COMPLETE remainder, 45 queries,
    # so the attestation drain finishes with it): every query below has
    # a full DuckDB oracle — including bloom_fpr_audit, which gained
    # one in r5 (md5-slice keys + hex-slice bucketing; previously the
    # only fixable no-oracle query) and lm_bigram_autogate (new in r5:
    # attests the LM broadcast-gate AUTO path itself, which every other
    # lm_* entry bypasses with a caller hint) — and all 45 were
    # verified hash-green under scripts/check_contract.py on the r5
    # engine. After this list, zero queries remain unattested: the
    # only entries without oracle_sql() are the no_oracle-BY-DESIGN
    # trio, which already hold prior-round rows-only driver records —
    # media_resize (output bytes pinned in pytest instead; binary
    # column), value_percentiles_approx (approx_percentile is
    # engine-defined, exact twin attested as value_percentiles), and
    # compression_quality (zlib ratio has no SQL twin; pinned in
    # pytest):
    #   bloom_fpr_audit, lm_bigram_autogate, bitext_pairs,
    #   script_profile, vocab_coverage,
    #   softdedup_weights, retrieval_metrics, anchor_bm25,
    #   snapshot_term_drift, zipf_slope, ngram_diversity,
    #   explore_exploit, curation_attribution, lsh_plan,
    #   host_boilerplate, sitemap_tree, pmi_collocations, readability,
    #   ip_asn_lookup, event_funnel, retention, cms_word_counts,
    #   mojibake_repair, postings_delta, tokenizer_fertility,
    #   stream_enrich, vocab_growth, url_tree, feed_entries,
    #   epoch_plan, hreflang_pairs, span_corruption,
    #   host_quality_prior, epoch_stream, lang_mismatch,
    #   pagination_chains, kmv_vocab_sample, bm25_tombstoned,
    #   merge_plan, stream_feed_poll, microdata_stats, coverage_gap,
    #   feed_discovery, stitched_chains, weighted_sample
    # ROUND-5 ROTATION (active): the 50 never-attested queries listed
    # above, swapped in as directed by the round-4 verdict. Everything
    # in rounds 1-4's lists keeps its CORRECTNESS_r0{1..4} file as the
    # permanent record. After this run the 45 ROUND-6 queries above
    # are all that remain.
    _front = [
        # WARC/CDX export + archive formats
        "warc_cdx",
        "wet_export",
        "warc_export",
        "wat_export",
        "cdx_zipnum",
        "warc_revisit",
        "redirect_resolution",
        "mime_sniff",
        "page_directives",
        # DUST / URL normalization family
        "dust_param_rules",
        "dust_collapse",
        "alias_collapse",
        "url_word_filter",
        # crawl scheduling / frontier long-tail
        "aimd_rates",
        "opic_importance",
        "host_traps",
        "stratified_sample",
        "revalidation_bandwidth",
        "seed_depth_rings",
        "fetch_timetable",
        "host_shard_ring",
        # graph long-tail
        "lpa_communities",
        "harmonic_hosts",
        "cocitation_hosts",
        "domain_webgraph",
        "degree_histogram",
        "reciprocal_links",
        # classifiers
        "logreg_quality",
        "nb_platt_calibration",
        # similarity / embedding long-tail
        "ssjoin_pairs",
        "containment_pairs",
        "lsh_recall",
        "embedding_outliers",
        "hard_negatives",
        "diversity_sample",
        "mmr_diversify",
        "media_ahash_neardup",
        "hll_host_cardinality",
        "fuzzy_contamination",
        # retrieval variants
        "champion_search",
        "champion_recall",
        "corrected_search",
        "fuzzy_terms",
        "rm_expansion",
        "kwic_snippets",
        "proximity_search",
        "html_quality",
        # training-data export long-tail
        "sequence_pack",
        "temperature_mix",
        "pii_cards",
    ]
    ordered = {k: q[k] for k in _front}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    return ordered


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def _sql_unigram_chain(maxlen: int = 8, mpl: int = 4,
                       seed_size: int = 20) -> str:
    """One unigram hard-EM round unrolled as CTEs (the _sql_bpe_chain
    pattern): seed substring counts, piece log-probs, then the Viterbi
    DP unrolled per string position (v1..v{maxlen}; candidates at
    position K join v_j for j in [K-mpl, K) against the (j, K) edge;
    argmin per word via the operator's exact total order — cost asc,
    piece count asc, \\x1f-joined path asc), best segmentation per
    word, integer recount, char floor."""
    toks = _SQL_TOKS.format(t="text")
    parts = [f"""hist AS MATERIALIZED (
          SELECT x AS word, CAST(count(*) AS BIGINT) AS freq
          FROM (SELECT unnest({toks}) AS x FROM documents)
          GROUP BY x),
        spos AS (SELECT word, freq,
                        unnest(range(1, length(word) + 1)) AS i
                 FROM hist),
        spl AS (SELECT word, freq, i,
                       unnest(range(1, least({mpl},
                                length(word) - i + 1) + 1)) AS l
                FROM spos),
        pcounts AS (
          SELECT substring(word, i, l) AS piece, l,
                 CAST(sum(freq) AS BIGINT) AS count
          FROM spl GROUP BY 1, 2),
        multi AS (SELECT piece, count FROM pcounts WHERE l >= 2
                  ORDER BY count DESC, piece ASC LIMIT {seed_size}),
        chars AS (SELECT piece, count FROM pcounts WHERE l = 1),
        seed AS MATERIALIZED (SELECT * FROM multi UNION ALL SELECT * FROM chars),
        vocab AS MATERIALIZED (
          SELECT piece,
                 ln(count / (SELECT CAST(sum(count) AS DOUBLE)
                             FROM seed)) AS lp
          FROM seed),
        epos AS (SELECT word, unnest(range(1, length(word) + 1)) AS i
                 FROM hist),
        epair AS (SELECT word, i,
                         unnest(range(greatest(0, i - {mpl}), i)) AS j
                  FROM epos),
        edges AS MATERIALIZED (
          SELECT e.word, e.j, e.i, v.lp,
                 substring(e.word, e.j + 1, e.i - e.j) AS piece
          FROM epair e
          JOIN vocab v ON v.piece = substring(e.word, e.j + 1,
                                              e.i - e.j)),
        v0 AS MATERIALIZED (SELECT word, freq, CAST(0.0 AS DOUBLE) AS cost,
                      0 AS np, CAST([] AS VARCHAR[]) AS path
               FROM hist)"""]
    def dp_pass(prefix: str, edges_name: str, vit_name: str) -> None:
        """Emit one unrolled Viterbi DP over ``edges_name`` into
        ``{prefix}1..{prefix}{maxlen}`` + the per-word best CTE
        ``vit_name`` — shared by the seed pass and the trained pass."""
        for k in range(1, maxlen + 1):
            cands = "\n            UNION ALL\n            ".join(
                f"""SELECT v.word, v.freq, v.cost - e.lp AS cost,
                   v.np + 1 AS np,
                   list_append(v.path, e.piece) AS path
            FROM {prefix}{j} v JOIN {edges_name} e
              ON e.word = v.word AND e.j = {j} AND e.i = {k}"""
                for j in range(max(0, k - mpl), k))
            parts.append(f"""{prefix}{k} AS MATERIALIZED (
          SELECT word, freq, cost, np, path FROM (
            SELECT c.*, row_number() OVER (
              PARTITION BY word
              ORDER BY cost ASC, np ASC,
                       array_to_string(path, chr(31)) ASC) AS rn
            FROM ({cands}) c)
          WHERE rn = 1)""")
        vit_union = "\n          UNION ALL\n          ".join(
            f"SELECT word, freq, path FROM {prefix}{k} "
            f"WHERE length(word) = {k}"
            for k in range(1, maxlen + 1))
        parts.append(f"""{vit_name} AS MATERIALIZED (
          {vit_union})""")

    dp_pass("v", "edges", "vit")
    parts.append("""segcnt AS MATERIALIZED (
          SELECT p AS piece, CAST(sum(freq) AS BIGINT) AS count
          FROM (SELECT freq, unnest(path) AS p FROM vit)
          GROUP BY 1),
        trained AS MATERIALIZED (
          SELECT piece, count FROM segcnt
          UNION ALL
          SELECT c.piece, CAST(1 AS BIGINT) AS count
          FROM chars c
          WHERE c.piece NOT IN (SELECT piece FROM segcnt)),
        vocab2 AS MATERIALIZED (
          SELECT piece,
                 ln(count / (SELECT CAST(sum(count) AS DOUBLE)
                             FROM trained)) AS lp
          FROM trained),
        edges2 AS MATERIALIZED (
          SELECT e.word, e.j, e.i, v.lp,
                 substring(e.word, e.j + 1, e.i - e.j) AS piece
          FROM epair e
          JOIN vocab2 v ON v.piece = substring(e.word, e.j + 1,
                                               e.i - e.j)),
        w0 AS MATERIALIZED (SELECT word, freq, CAST(0.0 AS DOUBLE) AS cost,
                      0 AS np, CAST([] AS VARCHAR[]) AS path
               FROM hist)""")
    # second DP pass under the TRAINED log-probs: this is the model the
    # Spark query actually encodes with (unigram_token_counts after
    # train_unigram), so the oracle must replay THIS segmentation —
    # sourcing n_pieces from the seed-model `vit` only coincides with
    # it on closed vocabularies (ADVICE r3)
    dp_pass("w", "edges2", "vit2")
    return ",\n        ".join(parts)


def oracle_sql() -> dict[str, str]:
    toks_doc = _SQL_TOKS.format(t="text")
    sh_doc = _SQL_SHINGLES.format(toks=toks_doc)
    o: dict[str, str] = {}

    o["url_canonicalize"] = f"""
        SELECT doc_id, {_sql_canon("url")} AS canon_url FROM (
          SELECT doc_id,
                 'https://www.' || source || '.org/Docs/' || CAST(doc_id AS VARCHAR)
                 || CASE WHEN doc_id % 3 = 0 THEN '/'
                         WHEN doc_id % 3 = 1 THEN '?ref=feed'
                         ELSE '#frag' END AS url
          FROM documents)
    """

    o["url_features"] = r"""
        WITH b AS (
          SELECT doc_id,
                 'https://www.' || source || '.org'
                 || CASE WHEN doc_id % 4 = 0 THEN ''
                         WHEN doc_id % 4 = 1
                           THEN '/a/b/c/page' || CAST(doc_id AS VARCHAR)
                         WHEN doc_id % 4 = 2
                           THEN '/item?id=' || CAST(doc_id AS VARCHAR)
                                || '&ref=feed&x=1'
                         ELSE '/p' || CAST(doc_id % 7 AS VARCHAR) || '/'
                    END AS url
          FROM documents),
        g AS (
          SELECT doc_id, url,
                 regexp_extract(rest, '^[^/?#]*([^?#]*)', 1) AS path,
                 regexp_extract(rest, '^[^#?]*\?([^#]*)', 1) AS query
          FROM (SELECT doc_id, url,
                       regexp_replace(url,
                         '^[a-zA-Z][a-zA-Z0-9+.\-]*://', '') AS rest
                FROM b))
        SELECT doc_id,
          len(list_filter(string_split(path, '/'), s -> s != ''))
            AS path_depth,
          length(path) AS path_len,
          CASE WHEN query = '' THEN 0
               ELSE len(string_split(query, '&')) END AS n_params,
          (len(list_filter(string_split(path, '/'), s -> s != '')) = 0
           AND query = '') AS is_homepage,
          round(length(regexp_replace(path, '[^0-9]', '', 'g'))
                / greatest(length(path), 1), 4) AS digit_ratio,
          length(url) AS url_len
        FROM g
    """

    o["host_traps"] = r"""
        WITH u AS (
          SELECT 'https://trap.test/cal/' || CAST(doc_id AS VARCHAR)
                 || '?session=' || CAST(doc_id * 7 AS VARCHAR)
                 || '&page=' || CAST(doc_id % 9 AS VARCHAR) AS url
          FROM documents
          UNION ALL
          SELECT 'https://' || source || '.org/page-'
                 || substr('abcdefg', CAST(doc_id % 7 AS INT) + 1, 1)
          FROM documents),
        r AS (
          SELECT url,
                 regexp_replace(url,
                   '^[a-zA-Z][a-zA-Z0-9+.\-]*://', '') AS rest
          FROM u),
        t AS (
          SELECT DISTINCT
            regexp_replace(regexp_replace(
              lower(regexp_extract(rest, '^([^/?#]*)', 1)),
              '^www\.', ''), ':\d+$', '') AS host,
            regexp_replace(regexp_replace(
              lower(regexp_extract(rest, '^([^/?#]*)', 1)),
              '^www\.', ''), ':\d+$', '')
            || regexp_replace(
                 regexp_extract(rest, '^[^/?#]*([^?#]*)', 1),
                 '[0-9]+', 'D', 'g')
            || regexp_replace(
                 regexp_extract(rest, '^[^#?]*(\?[^#]*)', 1),
                 '=[^&#]*', '=V', 'g') AS tmpl,
            md5(url) AS uu
          FROM r),
        per AS (
          SELECT host, tmpl, count(*) AS c FROM t GROUP BY host, tmpl),
        agg AS (
          SELECT host, CAST(sum(c) AS BIGINT) AS n_urls,
                 count(*) AS n_templates
          FROM per GROUP BY host)
        SELECT host, n_urls, n_templates,
               round(CAST(n_urls AS DOUBLE) / n_templates, 4)
                 AS urls_per_template,
               round(1.0 - CAST(n_templates AS DOUBLE) / n_urls, 4)
                 AS trap_score
        FROM agg WHERE n_urls >= 5
    """

    o["best_capture_dedup"] = f"""
        WITH cdx AS ({_EV_CDX_SQL}),
        g AS (
          SELECT {_sql_canon("url")} AS canon_url,
                 list(struct_pack(event_id := event_id, status := status,
                                  mime_detected := mime_detected,
                                  length := length, "timestamp" := "timestamp")
                      ORDER BY event_id) AS rs
          FROM cdx GROUP BY 1),
        w AS (SELECT canon_url, {_FOLD_SQL} AS win FROM g)
        SELECT canon_url,
               win['event_id'] AS w_event_id,
               win['status'] AS w_status,
               win['length'] AS w_length,
               win['timestamp'] AS w_timestamp
        FROM w
    """

    # incremental == global by left-fold composition (batches are arrival
    # prefixes), so the oracle is the same global fold as best_capture_dedup
    o["incremental_merge"] = o["best_capture_dedup"]

    # asof_capture: DuckDB's native ASOF LEFT JOIN is the spec the
    # union-merge window plan must reproduce exactly
    o["asof_capture"] = """
        SELECT l.event_id, l.user_id, l.ts,
               r.ts AS asof_ts, r.value AS asof_value
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') l
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """

    o["capture_time_travel"] = f"""
        WITH cdx AS ({_EV_CDX_SQL}),
        elig AS (SELECT * FROM cdx WHERE "timestamp" <= '20240105000000'),
        rnk AS (SELECT *, row_number() OVER (
                  PARTITION BY url
                  ORDER BY "timestamp" DESC, event_id DESC) AS rn
                FROM elig)
        SELECT url, event_id, status, mime_detected, length, "timestamp"
        FROM rnk WHERE rn = 1
    """

    # warc_revisit: the same digest synthesis (DuckDB md5(VARCHAR) hashes
    # UTF-8 = Spark md5 of the concat), prior originals = min ts per
    # (url, digest) before the cutoff; the batch original is rn=1 over
    # (ts, event_id) — the same total order as Spark's min(struct); its
    # refers_to is the partition-min timestamp
    o["warc_revisit"] = f"""
        WITH base AS ({_EV_CDX_SQL}),
        cdx AS (
          SELECT *, md5(url || ':' || CAST(event_id % 3 AS VARCHAR))
                 AS digest
          FROM base),
        pri AS (
          SELECT url, digest, min("timestamp") AS pts
          FROM cdx WHERE "timestamp" < '20240103000000'
          GROUP BY url, digest),
        cur AS (
          SELECT *,
                 row_number() OVER (PARTITION BY url, digest
                   ORDER BY "timestamp", event_id) AS rn,
                 min("timestamp") OVER (PARTITION BY url, digest) AS fts
          FROM cdx WHERE "timestamp" >= '20240103000000')
        SELECT c.event_id, c.url, c."timestamp", c.digest,
               CASE WHEN p.pts IS NOT NULL THEN 'revisit'
                    WHEN c.rn = 1 THEN 'response'
                    ELSE 'revisit' END AS record_type,
               CASE WHEN p.pts IS NOT NULL THEN p.pts
                    WHEN c.rn = 1 THEN NULL
                    ELSE c.fts END AS refers_to_ts
        FROM cur c LEFT JOIN pri p USING (url, digest)
    """

    # capture_diff: latest-as-of at each cutoff via row_number (same total
    # order as Spark's max_by over (ts, event_id)), then a full outer join
    o["capture_diff"] = f"""
        WITH cdx AS ({_EV_CDX_SQL}),
        oldv AS (
          SELECT url, status AS old_status, length AS old_length FROM (
            SELECT *, row_number() OVER (PARTITION BY url
              ORDER BY "timestamp" DESC, event_id DESC) AS rn
            FROM cdx WHERE "timestamp" <= '20240103000000') WHERE rn = 1
        ),
        newv AS (
          SELECT url, status AS new_status, length AS new_length FROM (
            SELECT *, row_number() OVER (PARTITION BY url
              ORDER BY "timestamp" DESC, event_id DESC) AS rn
            FROM cdx WHERE "timestamp" <= '20240105000000') WHERE rn = 1
        )
        SELECT coalesce(o.url, n.url) AS url,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'removed'
                    WHEN o.old_status IS DISTINCT FROM n.new_status
                         OR o.old_length IS DISTINCT FROM n.new_length
                    THEN 'changed'
                    ELSE 'unchanged' END AS change,
               o.old_status, o.old_length, n.new_status, n.new_length
        FROM oldv o FULL OUTER JOIN newv n ON o.url = n.url
    """

    # blocklist_filter: host = lowercased netloc minus www./port (same as
    # host_col); blocked = equal to or subdomain of any listed domain
    o["blocklist_filter"] = f"""
        WITH cdx AS ({_EV_CDX_SQL}),
        hosts AS (
          SELECT event_id, url, status,
                 regexp_replace(
                   lower(regexp_extract(url, 'https?://([^/?#]*)', 1)),
                   '^www\\.', '') AS host
          FROM cdx
        ),
        bl(domain) AS (
          VALUES ('site-3.test'), ('site-17.test'), ('site-29.test')
        )
        SELECT event_id, url, status FROM hosts h
        WHERE NOT EXISTS (
          SELECT 1 FROM bl
          WHERE h.host = bl.domain OR h.host LIKE '%.' || bl.domain)
    """

    # segment_dedup: same segmentation (1-based inclusive list slice ==
    # Spark's slice), keep-first via row_number over the fingerprint
    # ordered by (doc_id, pos) — the same total order as Spark's
    # min(struct(id, pos))
    # host_boilerplate: identical 2-word segmentation; the boilerplate
    # gate replayed as a HAVING over (source, segment) distinct-doc
    # counts joined to per-source doc totals; rebuild = string_agg
    # ordered by pos over the non-boilerplate segments. min_frac (0.1)
    # is the same double literal on both engines, so the >= cut is
    # bit-identical.
    o["host_boilerplate"] = """
        WITH words AS (
          SELECT doc_id, source, string_split(text, ' ') AS w
          FROM documents
        ),
        segbase AS (
          SELECT doc_id, source,
                 CAST(ceil(len(w) / 2.0) AS INT) AS n_segments, w
          FROM words
        ),
        numbered AS (
          SELECT doc_id, source, w, unnest(range(n_segments)) AS i
          FROM segbase
        ),
        segs AS (
          SELECT doc_id, source, CAST(i AS INT) AS pos,
                 array_to_string(w[i*2+1 : i*2+2], ' ') AS segment
          FROM numbered
        ),
        host_totals AS (
          SELECT source, count(DISTINCT doc_id) AS n_docs
          FROM documents GROUP BY source
        ),
        boiler AS (
          SELECT s.source, md5(s.segment) AS fp
          FROM segs s JOIN host_totals h ON s.source = h.source
          GROUP BY s.source, md5(s.segment), h.n_docs
          HAVING count(DISTINCT s.doc_id) >= 3
             AND count(DISTINCT s.doc_id) >= 0.1 * h.n_docs
        ),
        kept AS (
          SELECT s.* FROM segs s
          WHERE NOT EXISTS (
            SELECT 1 FROM boiler b
            WHERE b.source = s.source AND b.fp = md5(s.segment))
        ),
        rebuilt AS (
          SELECT doc_id, string_agg(segment, ' ' ORDER BY pos) AS text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT b.doc_id, b.source, coalesce(r.text, '') AS text,
               b.n_segments, CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
        FROM segbase b LEFT JOIN rebuilt r USING (doc_id)
    """

    o["segment_dedup"] = (
        f"WITH {_sql_segment_ctes('documents')} SELECT * FROM segfinal")

    # curation_pipeline_v2: the curation survivors feed the segment-dedup
    # chain, then a boilerplate-fraction gate (>= half the segments kept)
    o["curation_pipeline_v2"] = f"""
        WITH curated AS ({{curation}}),
        cursrc AS (
          SELECT d.doc_id, d.text FROM documents d
          JOIN curated c ON c.doc_id = d.doc_id
        ),
        {_sql_segment_ctes('cursrc')}
        SELECT * FROM segfinal WHERE n_kept * 2 >= n_segments
    """

    # sessionization: identical lag + running-sum composition; epoch_us on
    # both sides so a fractional-second gap straddling the 6h threshold
    # cuts the same way (Spark unix_micros == DuckDB epoch_us)
    # stream_sessionize: the streaming twin reproduces the BATCH
    # assignment exactly (state crosses micro-batches), so the oracle is
    # the batch lag+running-sum sessionization over the same projection
    o["stream_sessionize"] = """
        WITH ev AS (
          SELECT CAST(user_id AS VARCHAR) AS key,
                 epoch_us(ts) AS ts_micros
          FROM events),
        lagged AS (
          SELECT key, ts_micros,
                 lag(ts_micros) OVER (PARTITION BY key ORDER BY ts_micros)
                   AS prev_ts
          FROM ev),
        flagged AS (
          SELECT *,
                 CASE WHEN prev_ts IS NULL
                        OR ts_micros - prev_ts > 21600000000
                      THEN 1 ELSE 0 END AS is_new
          FROM lagged),
        numbered AS (
          SELECT *,
                 SUM(is_new) OVER (PARTITION BY key ORDER BY ts_micros
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                   AS ord
          FROM flagged)
        SELECT key, ts_micros,
               key || '#' || CAST(ord AS VARCHAR) AS session_id
        FROM numbered
    """

    # stream_dedup: the state-store dedup's survivors are one row per
    # distinct fingerprint; output columns are functions of the text,
    # so batch DISTINCT reproduces the streaming result exactly
    o["stream_dedup"] = """
        SELECT DISTINCT md5(text) AS fp, CAST(n_chars AS BIGINT) AS n_chars
        FROM documents
    """

    # stream_window_stats: the two watermark rules written out — rows
    # below the post-batch-0 watermark are DROPPED pre-aggregation (the
    # replayed earliest-fifth, >22000 s late), and append mode emits
    # exactly the windows whose end <= final watermark (max kept ts -
    # 7200). A stateless or watermark-less engine hash-mismatches.
    o["stream_window_stats"] = """
        WITH ev AS (
          SELECT 'h' || CAST(user_id % 7 AS VARCHAR) AS host,
                 (event_id * 37) % 100000 AS ts_sec,
                 CASE WHEN event_type = 'click'
                      THEN '200' ELSE '404' END AS status
          FROM events),
        kept AS (
          SELECT * FROM ev WHERE ts_sec < 50000
          UNION ALL
          SELECT * FROM ev WHERE ts_sec >= 50000),
        fwm AS (SELECT MAX(ts_sec) - 7200 AS wm FROM kept)
        SELECT CAST((ts_sec // 3600) * 3600 AS BIGINT) AS window_start_s,
               CAST((ts_sec // 3600) * 3600 + 3600 AS BIGINT)
                 AS window_end_s,
               host,
               COUNT(*) AS n_fetched,
               CAST(SUM(CASE WHEN status = '200' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ok
        FROM kept, fwm
        WHERE (ts_sec // 3600) * 3600 + 3600 <= fwm.wm
        GROUP BY 1, 2, 3
    """

    o["sessionization"] = """
        WITH lagged AS (
          SELECT event_id, user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
          FROM events
        ),
        flagged AS (
          SELECT *,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > 21600000000
                      THEN 1 ELSE 0 END AS is_new
          FROM lagged
        ),
        numbered AS (
          SELECT *,
                 SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                   AS ord
          FROM flagged
        )
        SELECT event_id, user_id, ts,
               CAST(user_id AS VARCHAR) || '#' || CAST(ord AS VARCHAR)
                 AS session_id
        FROM numbered
    """

    o["seen_anti_join"] = """
        SELECT o_orderkey FROM orders
        WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    """
    o["bloom_anti_join"] = """
        SELECT o_orderkey FROM orders
        WHERE o_orderkey NOT IN (
          SELECT l_orderkey FROM lineitem
          WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) < '4')
    """

    # cuckoo_anti_join: membership in (seen MINUS removed) — the removed
    # md5-first-char-<'1' subset must be crawlable again after eviction
    o["cuckoo_anti_join"] = """
        SELECT o_orderkey FROM orders
        WHERE o_orderkey NOT IN (
          SELECT l_orderkey FROM lineitem
          WHERE substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) < '4'
            AND substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) >= '1')
    """

    # bloom_fpr_audit: full replay of the Bloom build+probe. The bit
    # indices are k fixed 32-bit hex slices of the key (seen_set.
    # _key_indices) and the audit's bucket is a DISJOINT hex slice, so
    # the whole pipeline — per-bucket (m, k) sizing, bit sets, probe
    # membership — is pure SQL. Sizing replays _bloom_params: m0 =
    # max(floor(-n*ln(.01)/ln(2)^2), 64) rounded up to a power of two,
    # k = clamp(round(m/n*ln 2), 1, 5).
    o["bloom_fpr_audit"] = """
        WITH tenfold AS MATERIALIZED (
          SELECT doc_id, j FROM documents, range(0, 10) t(j)
        ),
        sk AS MATERIALIZED (
          SELECT md5('seen-' || CAST(doc_id AS VARCHAR) || '-'
                     || CAST(j AS VARCHAR))
                 || substr(md5('salt:seen-' || CAST(doc_id AS VARCHAR)
                               || '-' || CAST(j AS VARCHAR)), 1, 16) AS key
          FROM tenfold),
        pk AS MATERIALIZED (
          SELECT md5('fresh-' || CAST(doc_id AS VARCHAR) || '-'
                     || CAST(j AS VARCHAR))
                 || substr(md5('salt:fresh-' || CAST(doc_id AS VARCHAR)
                               || '-' || CAST(j AS VARCHAR)), 1, 16) AS key
          FROM tenfold),
        sb AS MATERIALIZED (
          SELECT key, ('0x' || substr(key, 41, 8))::BIGINT % 16 AS bucket
          FROM sk),
        pb AS MATERIALIZED (
          SELECT key, ('0x' || substr(key, 41, 8))::BIGINT % 16 AS bucket
          FROM pk),
        params AS MATERIALIZED (
          SELECT bucket, count(*) AS n,
                 GREATEST(CAST(floor((-count(*) * ln(0.01))
                                     / (ln(2) * ln(2))) AS BIGINT),
                          64) AS m0
          FROM sb GROUP BY bucket),
        params3 AS MATERIALIZED (
          SELECT bucket, n, m2,
                 CAST(GREATEST(1, LEAST(5, round((CAST(m2 AS DOUBLE) / n)
                                                 * ln(2)))) AS INTEGER) AS k
          FROM (
            SELECT bucket, n,
                   (SELECT min(1::BIGINT << g) FROM range(6, 40) r(g)
                    WHERE (1::BIGINT << g) >= m0) AS m2
            FROM params)),
        seen_bits AS MATERIALIZED (
          SELECT DISTINCT s.bucket,
                 ('0x' || substr(s.key, jj * 8 + 1, 8))::BIGINT % p.m2 AS idx
          FROM sb s JOIN params3 p USING (bucket), range(0, 5) r(jj)
          WHERE jj < p.k),
        probe_idx AS MATERIALIZED (
          SELECT pr.key, pr.bucket,
                 ('0x' || substr(pr.key, jj * 8 + 1, 8))::BIGINT % p.m2 AS idx
          FROM pb pr JOIN params3 p USING (bucket), range(0, 5) r(jj)
          WHERE jj < p.k),
        hits AS MATERIALIZED (
          SELECT pi.key, bool_and(sb2.idx IS NOT NULL) AS maybe_seen
          FROM probe_idx pi
          LEFT JOIN seen_bits sb2
            ON sb2.bucket = pi.bucket AND sb2.idx = pi.idx
          GROUP BY pi.key),
        verdicts AS MATERIALIZED (
          SELECT pb.key, COALESCE(h.maybe_seen, FALSE) AS maybe_seen
          FROM pb LEFT JOIN hits h USING (key))
        SELECT CAST(count(*) AS BIGINT) AS n_probes,
               CAST(sum(CASE WHEN maybe_seen THEN 1 ELSE 0 END) AS BIGINT)
                 AS false_positives,
               round(CAST(sum(CASE WHEN maybe_seen THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS fpr,
               CAST(0.01 AS DOUBLE) AS fp_budget
        FROM verdicts
    """

    o["politeness_schedule"] = """
        SELECT host, host_rank, event_id FROM (
          SELECT 'site-' || CAST(user_id % 37 AS VARCHAR) AS host, event_id,
                 row_number() OVER (PARTITION BY 'site-' || CAST(user_id % 37 AS VARCHAR)
                                    ORDER BY ts, event_id) AS host_rank
          FROM events)
        WHERE host_rank <= 5
    """

    o["politeness_delay_schedule"] = """
        SELECT host, host_rank, event_id FROM (
          SELECT host, event_id,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY ts, event_id) AS host_rank,
                 least(budget, 6) AS lim
          FROM (
            SELECT 'site-' || CAST(user_id % 23 AS VARCHAR) AS host,
                   event_id, ts,
                   CAST(floor(10.0 / (user_id % 23 % 3 + 1)) AS INTEGER)
                     AS budget
            FROM events))
        WHERE host_rank <= lim
    """

    # crawl_budget: value-weighted budget split, robots-delay ceiling,
    # 6dp-rounded shares pre-floor (the cross-engine float convention)
    o["crawl_budget"] = """
        WITH f AS (
          SELECT source || '.test' AS host,
                 (doc_id % 11) / CAST(10.0 AS DOUBLE) AS p,
                 (doc_id % 7) / CAST(7.0 AS DOUBLE) AS q
          FROM documents),
        per AS (
          SELECT host, COUNT(*) AS n_pending, SUM(p) AS ec, AVG(q) AS hq
          FROM f GROUP BY host),
        rob AS (
          SELECT DISTINCT source || '.test' AS host,
                 CAST(CAST(regexp_extract(source, '(\\d+)', 1) AS INT)
                      % 4 * 15 AS DOUBLE) AS delay
          FROM documents),
        w AS (
          SELECT per.*, rob.delay,
                 ROUND(GREATEST(hq, 0) * GREATEST(ec, 0), 6) AS wt
          FROM per LEFT JOIN rob USING (host)),
        tot AS (SELECT SUM(wt) AS t FROM w)
        SELECT host, n_pending,
               ROUND(ec, 6) AS expected_changed,
               ROUND(hq, 6) AS host_quality,
               CASE WHEN delay > 0
                    THEN CAST(FLOOR(1800.0 / delay) AS BIGINT) END
                 AS politeness_cap,
               LEAST(
                 n_pending,
                 COALESCE(CASE WHEN delay > 0
                               THEN CAST(FLOOR(1800.0 / delay) AS BIGINT)
                          END, n_pending),
                 GREATEST(
                   CASE WHEN t.t > 0
                        THEN CAST(FLOOR(ROUND(300.0 * wt / t.t, 6))
                                  AS BIGINT)
                        ELSE 0 END,
                   0)) AS quota
        FROM w, tot t
    """

    o["word_topk"] = f"""
        SELECT word, COUNT(*) AS cnt FROM (
          SELECT unnest({toks_doc}) AS word FROM documents)
        GROUP BY word ORDER BY cnt DESC, word LIMIT 20
    """

    o["year_histogram"] = """
        SELECT CAST(year(ts) AS INTEGER) AS year, COUNT(*) AS cnt
        FROM events GROUP BY 1 ORDER BY 1
    """

    o["top_users"] = """
        SELECT user_id, COUNT(*) AS cnt FROM events
        GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 10
    """

    o["key_skew"] = """
        WITH c AS (
          SELECT user_id AS key, count(*) AS cnt FROM events
          GROUP BY user_id),
        t AS (SELECT count(*) AS total FROM events),
        top AS (SELECT key, cnt FROM c
                ORDER BY cnt DESC, key ASC LIMIT 20)
        SELECT row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank,
               key, cnt,
               round(cnt / CAST(t.total AS DOUBLE), 6) AS share
        FROM top, t
    """

    o["value_percentiles"] = """
        SELECT COUNT(value) AS n, round(avg(value), 4) AS mean,
               min(value) AS min, max(value) AS max,
               round(quantile_cont(value, 0.25), 4) AS p25,
               round(quantile_cont(value, 0.50), 4) AS p50,
               round(quantile_cont(value, 0.75), 4) AS p75,
               round(quantile_cont(value, 0.90), 4) AS p90,
               round(quantile_cont(value, 0.95), 4) AS p95,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events
    """

    o["keyword_filter"] = """
        SELECT doc_id, pos, neg FROM (
          SELECT doc_id,
                 len(regexp_extract_all(lower(text), '\\bspark\\b'))
                 + len(regexp_extract_all(lower(text), '\\bwindow\\b')) AS pos,
                 len(regexp_extract_all(lower(text), '\\bslow\\b'))
                 + len(regexp_extract_all(lower(text), '\\berror\\b')) AS neg
          FROM documents)
        WHERE (neg = 0 AND pos >= 1) OR pos > neg
    """

    o["props_json_extract"] = """
        SELECT event_id, json_extract_string(props, '$.k') AS k FROM events
    """

    o["deterministic_sample"] = """
        SELECT doc_id FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '28'
    """

    # stratified_sample: sqrt-allocation quotas (share rounded 6dp
    # before the floor — the engine's libm-parity convention), then the
    # quota-many smallest md5('42' || 0x1f || doc_id) per language
    o["stratified_sample"] = """
        WITH sizes AS (
          SELECT lang, COUNT(*) AS sz FROM documents GROUP BY lang),
        tot AS (SELECT SUM(sqrt(sz)) AS s FROM sizes),
        quota AS (
          SELECT lang,
                 GREATEST(1, CAST(FLOOR(ROUND(
                   100.0 * sqrt(sz) / t.s, 6)) AS BIGINT)) AS q
          FROM sizes, tot t),
        ranked AS (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('42' || chr(31) || CAST(doc_id AS VARCHAR)),
                            doc_id) AS rk
          FROM documents)
        SELECT r.doc_id, r.lang
        FROM ranked r JOIN quota USING (lang)
        WHERE r.rk <= quota.q
    """

    en = _sql_stop_hits("toks", "en")
    de = _sql_stop_hits("toks", "de")
    fr = _sql_stop_hits("toks", "fr")
    o["language_id"] = f"""
        SELECT doc_id,
               CASE WHEN best IS NULL THEN 'und'
                    WHEN best = 0 THEN 'und'
                    WHEN en_h = best THEN 'en'
                    WHEN de_h = best THEN 'de' ELSE 'fr' END AS pred_lang
        FROM (
          SELECT doc_id, en_h, de_h, fr_h, greatest(en_h, de_h, fr_h) AS best
          FROM (
            SELECT doc_id, {en} AS en_h, {de} AS de_h, {fr} AS fr_h
            FROM (SELECT doc_id, {toks_doc} AS toks FROM documents)))
    """

    o["token_counts"] = f"""
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                 AS ws_tokens,
               len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens
        FROM documents
    """

    # tokenizer_fertility: same token counters as token_counts, summed
    # per lang; ratios as ratio-of-sums (exact integer sums, one 6dp
    # rounding at the end)
    o["tokenizer_fertility"] = f"""
        WITH per AS (
          SELECT lang,
                 len(list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '')) AS w,
                 len(regexp_extract_all(text, '{BPE_RE}')) AS b,
                 length(text) AS c
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS n_words,
               CAST(SUM(b) AS BIGINT) AS n_pretokens,
               round(SUM(b) / CAST(SUM(w) AS DOUBLE), 6) AS fertility,
               round(SUM(c) / CAST(SUM(b) AS DOUBLE), 6) AS chars_per_tok
        FROM per GROUP BY lang
    """

    # bpe_merges / bpe_tokens: training replayed via unrolled CTEs
    # (one pair-count + argmax + merge-fold triple per iteration);
    # encoding nests one list_reduce per learned merge
    _bpe_n = 6
    o["bpe_merges"] = f"""
        WITH {_sql_bpe_chain(_bpe_n)}
        SELECT * FROM (
          {" UNION ALL ".join(
              f'SELECT {k} AS "rank", s1 AS "left", s2 AS "right",'
              f' pf AS pair_freq FROM b{k}'
              for k in range(1, _bpe_n + 1))}
        )
    """
    _bpe_toks_d = _SQL_TOKS.format(t="d.text")
    _bpe_enc = _sql_bpe_encode_expr(_bpe_n)
    o["bpe_tokens"] = f"""
        WITH {_sql_bpe_chain(_bpe_n)},
        enc AS (
          SELECT d.doc_id,
                 flatten(list_transform({_bpe_toks_d},
                                        wv -> {_bpe_enc})) AS toks
          FROM documents d
          {" ".join(f"CROSS JOIN b{k} m{k}"
                    for k in range(1, _bpe_n + 1))})
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_bpe,
               array_to_string(toks, ' ') AS bpe_text
        FROM enc
    """

    stop_ratio = (
        f"round({_sql_stop_hits('toks', 'en')} / greatest(len(toks), 1), 4)"
    )
    o["quality_scores"] = f"""
        WITH t AS (SELECT doc_id, text, {toks_doc} AS toks FROM documents),
        feats AS (
          SELECT doc_id, len(toks) AS n_tokens,
                 round(len(regexp_extract_all(text, '{PUNCT_RE}'))
                       / greatest(length(text), 1), 4) AS punct_ratio,
                 {stop_ratio} AS stopword_ratio
          FROM t)
        SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
               round(0.4 * (CASE WHEN n_tokens >= 20 THEN 1.0
                                 ELSE n_tokens / 20.0 END)
                     + 0.4 * least(stopword_ratio * 2.5, 1.0)
                     + 0.2 * greatest(0.0, 1.0 - punct_ratio * 5.0), 4) AS quality
        FROM feats
    """

    # gopher_quality: same multi-line construction, signals via DuckDB
    # list lambdas — exact match to the Catalyst array expressions
    o["gopher_quality"] = """
        WITH m AS (
          SELECT doc_id,
            concat_ws(chr(10), text,
              substr(text, 1, 40),
              CASE WHEN doc_id % 3 = 0 THEN substr(text, 1, 40)
                   ELSE substr(text, 41, 40) END,
              CASE WHEN doc_id % 4 = 0 THEN '- bullet item'
                   ELSE 'plain tail line' END,
              CASE WHEN doc_id % 5 = 0 THEN 'to be continued...'
                   ELSE 'the end' END) AS mtext
          FROM documents),
        sig AS (
          SELECT doc_id, mtext,
            list_filter(list_transform(string_split(mtext, chr(10)),
                                       l -> trim(l)), l -> l != '') AS lines,
            list_filter(regexp_split_to_array(mtext, '\\s+'),
                        w -> w != '') AS words
          FROM m),
        feats AS (
          SELECT doc_id,
            len(lines) AS n_lines,
            len(words) AS n_words,
            round(coalesce(list_sum(list_transform(words, w -> length(w))), 0)
                  / greatest(len(words), 1), 4) AS mean_word_len,
            round(1.0 - len(list_distinct(lines)) / greatest(len(lines), 1), 4)
              AS dup_line_frac,
            round(1.0 - coalesce(list_sum(list_transform(list_distinct(lines),
                                                         l -> length(l))), 0)
                  / greatest(coalesce(list_sum(list_transform(lines,
                                               l -> length(l))), 0), 1), 4)
              AS dup_line_char_frac,
            round(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]')))
                  / greatest(len(lines), 1), 4) AS bullet_line_frac,
            round(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)$')))
                  / greatest(len(lines), 1), 4) AS ellipsis_line_frac,
            round((len(regexp_extract_all(mtext, '#'))
                   + len(regexp_extract_all(mtext, '(\\.\\.\\.|…)')))
                  / greatest(len(words), 1), 4) AS symbol_word_ratio,
            round(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]')))
                  / greatest(len(words), 1), 4) AS alpha_word_frac
          FROM sig)
        SELECT *,
          (n_words BETWEEN 50 AND 100000
           AND mean_word_len BETWEEN 3 AND 10
           AND symbol_word_ratio < 0.1
           AND bullet_line_frac < 0.9
           AND ellipsis_line_frac < 0.3
           AND alpha_word_frac > 0.8
           AND dup_line_frac < 0.3
           AND dup_line_char_frac < 0.3) AS keep
        FROM feats
    """

    # gopher_repetition: the same tagged n-gram stream, per-(doc, n, gram)
    # count, argmax char product, and sorted-position union fold as the
    # Spark operator — one UNION ALL arm per n (thresholds from
    # GOPHER_TOP_NGRAM_MAX / GOPHER_DUP_NGRAM_MAX, shared constants)
    from commoncrawl_spark.operators.text_dedup import (
        GOPHER_DUP_NGRAM_MAX as _G_DUP,
        GOPHER_TOP_NGRAM_MAX as _G_TOP,
    )

    _g_arms = "\n          UNION ALL\n".join(
        f"""          SELECT doc_id, {n} AS n, pos,
                 md5(array_to_string(ws[pos:pos + {n - 1}], ' ')) AS gram,
                 list_sum(list_transform(ws[pos:pos + {n - 1}],
                                         w -> length(w))) AS gchars
          FROM (SELECT doc_id, ws, unnest(range(1, nw - {n} + 2)) AS pos
                FROM b2 WHERE nw >= {n})"""
        for n in sorted(set(_G_TOP) | set(_G_DUP)))
    _g_pivot = ",\n                 ".join(
        [f"max(CASE WHEN n = {n} THEN top_mass END) AS t{n}"
         for n in _G_TOP]
        + [f"max(CASE WHEN n = {n} THEN dup_words END) AS d{n}"
           for n in _G_DUP])
    _g_fracs = ",\n               ".join(
        [f"round(coalesce(w.t{n}, 0) / greatest(b.wchars, 1), 6)"
         f" AS top{n}_char_frac" for n in _G_TOP]
        + [f"round(coalesce(w.d{n}, 0) / greatest(b.nw, 1), 6)"
           f" AS dup{n}_word_frac" for n in _G_DUP])
    _g_keep = "\n           AND ".join(
        [f"top{n}_char_frac <= {t}" for n, t in _G_TOP.items()]
        + [f"dup{n}_word_frac <= {t}" for n, t in _G_DUP.items()])

    def _grep_chain(src: str) -> str:
        """The gopher-repetition CTE chain over table ``src``; the
        final CTE ``fr`` carries one row per doc with the fraction
        columns (compose ``_g_keep`` on top)."""
        return f"""base AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             w -> w != '') AS ws
          FROM {src}),
        b2 AS (
          SELECT doc_id, ws, len(ws) AS nw,
                 coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
                   AS wchars
          FROM base),
        g AS (
{_g_arms}),
        c AS (
          SELECT doc_id, n, gram, count(*) AS cnt, min(gchars) AS gchars,
                 list_sort(list(pos)) AS ps
          FROM g GROUP BY doc_id, n, gram),
        p AS (
          SELECT doc_id, n,
                 max(CASE WHEN cnt >= 2 THEN cnt * gchars END) AS top_mass,
                 list_sort(flatten(list(ps) FILTER (WHERE cnt >= 2))) AS dps
          FROM c GROUP BY doc_id, n),
        u AS (
          SELECT doc_id, n, top_mass,
                 CASE WHEN len(dps) > 0 THEN
                   CAST(coalesce(list_sum(list_transform(
                     range(1, len(dps)),
                     i -> least(n, dps[i + 1] - dps[i]))), 0) AS BIGINT) + n
                 ELSE 0 END AS dup_words
          FROM p),
        w AS (
          SELECT doc_id,
                 {_g_pivot}
          FROM u GROUP BY doc_id),
        fr AS (
          SELECT b.doc_id, CAST(b.nw AS BIGINT) AS n_words,
               {_g_fracs}
          FROM b2 b LEFT JOIN w ON w.doc_id = b.doc_id)"""

    o["gopher_repetition"] = f"""
        WITH {_grep_chain("documents")}
        SELECT *,
          ({_g_keep}) AS repetition_keep
        FROM fr
    """

    o["doc_fingerprint"] = """
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                 AS fingerprint
        FROM documents
    """

    # pii_redaction: identical pattern list on both sides, generated
    # from PII_PATTERNS (patterns are Java-regex/RE2-portable by design)
    from commoncrawl_spark.functions.text import PII_PATTERNS

    _pii_src = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail' || "
        "CAST(doc_id % 7 AS VARCHAR) || '.test from 10.2.' || "
        "CAST(doc_id % 250 AS VARCHAR) || '.77 call 555-123-4567 or +4930' "
        "|| CAST(doc_id % 1000 + 1000 AS VARCHAR)"
    )
    _redact = "s"
    for _kind, _pat in PII_PATTERNS:
        _redact = (f"regexp_replace({_redact}, '{_pat}', "
                   f"'<PII:{_kind}>', 'g')")
    _pii_counts = ", ".join(
        f"CAST(len(regexp_extract_all(s, '{_pat}')) AS INT) AS n_{_kind}"
        for _kind, _pat in PII_PATTERNS)
    o["pii_redaction"] = f"""
        WITH p AS (SELECT doc_id, {_pii_src} AS s FROM documents)
        SELECT doc_id, {_redact} AS redacted, {_pii_counts} FROM p
    """

    # warc_segment_read: every parsed field recomputed from the
    # generating parameters (HTTP preamble length is a build-time
    # constant of the record builder)
    from commoncrawl_spark.sources.warc import _HTTP_OK

    o["warc_segment_read"] = f"""
        WITH d AS (SELECT doc_id, text, doc_id % 50 AS seg FROM documents)
        SELECT 'https://w.test/' || CAST(doc_id AS VARCHAR) AS url,
               CAST(row_number() OVER (PARTITION BY seg ORDER BY doc_id) - 1
                    AS INT) AS record_idx,
               CAST({len(_HTTP_OK)} + octet_length(encode(text)) AS BIGINT)
                 AS content_length,
               text AS body
        FROM d
    """

    # warc_cdx: every index field recomputed from the generating
    # parameters; the digest hashes the identical bytes on both engines
    # (DuckDB sha256(VARCHAR) hashes the UTF-8 encoding = Spark's
    # sha2 over the binary payload)
    _http_ok_sql = ("e'" + _HTTP_OK.decode("ascii")
                    .replace("\r", "\\r").replace("\n", "\\n") + "'")
    o["warc_cdx"] = f"""
        WITH d AS (SELECT doc_id, text, doc_id % 50 AS seg FROM documents)
        SELECT 'test,w)/' || CAST(doc_id AS VARCHAR) AS surt,
               '20240101000000' AS cdx_ts,
               'https://w.test/' || CAST(doc_id AS VARCHAR) AS url,
               sha256({_http_ok_sql} || text) AS digest,
               CAST(row_number() OVER (PARTITION BY seg ORDER BY doc_id) - 1
                    AS INT) AS record_idx,
               CAST({len(_HTTP_OK)} + octet_length(encode(text)) AS BIGINT)
                 AS payload_length
        FROM d
    """

    # cdx_zipnum: the global sorted rank the engine derives without a
    # window, written here as the plain ROW_NUMBER spec; DuckDB // is
    # integer division
    o["cdx_zipnum"] = """
        WITH cdx AS (
          SELECT concat('org,', source, ')/p', CAST(doc_id AS VARCHAR))
                   AS surt,
                 CAST(20200000000000 + doc_id AS VARCHAR) AS cdx_ts
          FROM documents),
        ranked AS (
          SELECT surt, cdx_ts,
                 ROW_NUMBER() OVER (ORDER BY surt, cdx_ts) - 1 AS rk
          FROM cdx)
        SELECT CAST(rk // 16 AS BIGINT) AS block_seq,
               CAST((rk // 16) // 4 AS BIGINT) AS shard,
               arg_min(surt, rk) AS start_surt,
               arg_min(cdx_ts, rk) AS start_cdx_ts,
               COUNT(*) AS n_lines
        FROM ranked
        GROUP BY rk // 16
    """

    # wet_export: every field recomputed from the generating parameters;
    # record_idx is the URL sort rank within the shard (the builder's
    # sorted-by-url contract); sha256(VARCHAR) hashes UTF-8 = Spark's
    # sha2 over the parsed payload bytes
    o["wet_export"] = """
        WITH d AS (
          SELECT doc_id, text, CAST(doc_id % 8 AS INT) AS shard,
                 'https://w.test/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents)
        SELECT shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY url) - 1
                    AS INT) AS record_idx,
               url,
               'conversion' AS warc_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
               sha256(text) AS digest
        FROM d
    """

    # warc_export: the HTTP response block rebuilt byte-for-byte (the
    # operator's pinned _HTTP_OK status+header constant, then the body),
    # record_idx = URL sort rank within the shard; sha256(VARCHAR)
    # hashes UTF-8 = Spark's sha2 over the parsed payload bytes
    o["warc_export"] = """
        WITH d AS (
          SELECT CAST(doc_id % 8 AS INT) AS shard,
                 'https://wr.test/' || CAST(doc_id AS VARCHAR) AS url,
                 'HTTP/1.1 200 OK' || chr(13) || chr(10)
                   || 'Content-Type: text/html; charset=utf-8'
                   || chr(13) || chr(10) || chr(13) || chr(10)
                   || '<html><body>' || text || '</body></html>'
                   AS http_block
          FROM documents)
        SELECT shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY url) - 1
                    AS INT) AS record_idx,
               url,
               'response' AS warc_type,
               CAST(octet_length(encode(http_block)) AS BIGINT)
                 AS content_length,
               sha256(http_block) AS digest
        FROM d
    """

    # wat_export: the envelope JSON rebuilt byte-for-byte from the
    # generating templates (links in sort_array order — the internal
    # https://w... target always precedes the external https://x...);
    # record_idx is the URL sort rank within the shard; sha256(VARCHAR)
    # hashes UTF-8 = Spark's sha2 over the parsed payload bytes
    o["wat_export"] = """
        WITH d AS (
          SELECT doc_id,
                 CAST(doc_id % 8 AS INT) AS shard,
                 'https://w' || CAST(doc_id % 5 AS VARCHAR) || '.test/a/'
                   || CAST(doc_id AS VARCHAR) AS url,
                 'Doc ' || CAST(doc_id AS VARCHAR) AS title,
                 'https://w' || CAST(doc_id % 5 AS VARCHAR) || '.test/q/'
                   || CAST(doc_id % 7 AS VARCHAR) AS l_int,
                 'https://x' || CAST((doc_id + 1) % 5 AS VARCHAR)
                   || '.test/p/' || CAST(doc_id % 11 AS VARCHAR) AS l_ext
          FROM documents),
        p AS (
          SELECT shard, url, title,
                 '{"Envelope":{"WARC-Header-Metadata":'
                 || '{"WARC-Target-URI":"' || url
                 || '"},"Payload-Metadata":{"HTTP-Response-Metadata":'
                 || '{"HTML-Metadata":{"Head":{"Title":"' || title
                 || '"},"Links":[{"path":"A@/href","url":"' || l_int
                 || '"},{"path":"A@/href","url":"' || l_ext
                 || '"}]}}}}}' AS payload
          FROM d)
        SELECT shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY url) - 1
                    AS INT) AS record_idx,
               url,
               'metadata' AS warc_type,
               CAST(octet_length(encode(payload)) AS BIGINT)
                 AS content_length,
               title,
               sha256(payload) AS digest
        FROM p
    """

    # sitemap_discovery: expected rows from first principles — two page
    # locs per doc from the urlset, one nested loc from the sitemapindex
    # sitemap_tree: expected locs re-derived from the generating
    # arithmetic — per doc: 2 pages via sm-a at depth 1, 1 page via
    # sm-c (behind the nested index) at depth 2; the dangling
    # sm-missing loc has no body and must contribute nothing
    o["sitemap_tree"] = """
        WITH d AS (
          SELECT CAST(doc_id AS VARCHAR) AS i,
                 'https://s' || CAST(doc_id AS VARCHAR) || '.test/' AS b
          FROM documents)
        SELECT b || 'sitemap.xml' AS root, b || 'sm-a.xml' AS sitemap_url,
               1 AS depth, b || 'p/' || i || '/1' AS loc FROM d
        UNION ALL
        SELECT b || 'sitemap.xml', b || 'sm-a.xml', 1,
               b || 'p/' || i || '/2' FROM d
        UNION ALL
        SELECT b || 'sitemap.xml', b || 'sm-c.xml', 2,
               b || 'p/' || i || '/3' FROM d
    """

    o["sitemap_discovery"] = """
        WITH d AS (
          SELECT doc_id,
                 source || '-' || CAST(doc_id AS VARCHAR) || '.sm.test' AS host
          FROM documents)
        SELECT 'https://' || host || '/sitemap.xml' AS sitemap_url,
               FALSE AS is_index,
               'https://' || host || '/p/' || CAST(doc_id % 7 AS VARCHAR) AS loc
        FROM d
        UNION ALL
        SELECT 'https://' || host || '/sitemap.xml', FALSE,
               'https://' || host || '/q/' || CAST(doc_id % 3 AS VARCHAR)
        FROM d
        UNION ALL
        SELECT 'https://' || host || '/news/index.xml', TRUE,
               'https://' || host || '/maps/part-'
                 || CAST(doc_id % 5 AS VARCHAR) || '.xml'
        FROM d
    """

    o["link_discovery"] = """
        WITH d AS (
          SELECT doc_id, source, lang,
                 'https://' || source || '.news.test/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) || '/story' AS src_url,
                 'https://' || source || '.news.test' AS origin,
                 'https://' || source || '.news.test/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) || '/' AS dir
          FROM documents)
        SELECT src_url, href, abs_url FROM (
          SELECT src_url,
                 'https://ext.test/p/' || CAST(doc_id % 50 AS VARCHAR) AS href,
                 'https://ext.test/p/' || CAST(doc_id % 50 AS VARCHAR) AS abs_url
          FROM d
          UNION ALL
          SELECT src_url,
                 '/section/' || CAST(doc_id % 7 AS VARCHAR),
                 origin || '/section/' || CAST(doc_id % 7 AS VARCHAR)
          FROM d
          UNION ALL
          SELECT src_url,
                 'rel/' || CAST(doc_id % 3 AS VARCHAR) || '.html',
                 dir || 'rel/' || CAST(doc_id % 3 AS VARCHAR) || '.html'
          FROM d
          UNION ALL
          SELECT src_url,
                 '//cdn.test/img/' || CAST(doc_id % 5 AS VARCHAR),
                 'https://cdn.test/img/' || CAST(doc_id % 5 AS VARCHAR)
          FROM d)
    """

    o["curation_pipeline"] = f"""
        WITH t AS (SELECT doc_id, text, {toks_doc} AS toks FROM documents),
        scored AS (
          SELECT doc_id,
                 CASE WHEN best IS NULL OR best = 0 THEN 'und'
                      WHEN en_h = best THEN 'en'
                      WHEN de_h = best THEN 'de' ELSE 'fr' END AS pred_lang,
                 n_tokens,
                 round(0.4 * (CASE WHEN n_tokens >= 20 THEN 1.0
                                   ELSE n_tokens / 20.0 END)
                       + 0.4 * least(stopword_ratio * 2.5, 1.0)
                       + 0.2 * greatest(0.0, 1.0 - punct_ratio * 5.0), 4)
                   AS quality,
                 fingerprint
          FROM (
            SELECT doc_id,
                   {_sql_stop_hits('toks', 'en')} AS en_h,
                   {_sql_stop_hits('toks', 'de')} AS de_h,
                   {_sql_stop_hits('toks', 'fr')} AS fr_h,
                   greatest({_sql_stop_hits('toks', 'en')},
                            {_sql_stop_hits('toks', 'de')},
                            {_sql_stop_hits('toks', 'fr')}) AS best,
                   len(toks) AS n_tokens,
                   round(len(regexp_extract_all(text, '{PUNCT_RE}'))
                         / greatest(length(text), 1), 4) AS punct_ratio,
                   round({_sql_stop_hits('toks', 'en')}
                         / greatest(len(toks), 1), 4) AS stopword_ratio,
                   md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                           'g'))) AS fingerprint
            FROM t)),
        kept AS (
          SELECT * FROM scored
          WHERE pred_lang = 'en' AND quality >= 0.5 AND n_tokens >= 10)
        SELECT doc_id, pred_lang, n_tokens, quality FROM (
          SELECT *, row_number() OVER (PARTITION BY fingerprint
                                       ORDER BY doc_id) AS rn
          FROM kept)
        WHERE rn = 1
    """

    # crawl_pipeline: the flagship dedup -> 200-gate -> fetch -> extract
    # pipeline over the deterministic documents-derived corpus
    # (_entry_pages_cdx). The oracle reconstructs the extractor's output
    # from first principles: title/time/author are the synthesized
    # elements' texts, extracted body text == the document text (single
    # <p>, no markup/entities in the corpus — verified clean), and the
    # status gate reduces to "any capture is 200" because criterion 1 of
    # choose_better_record (status-200 dominance,
    # reference download_and_merge.py:199-201) makes the fold's winner
    # 200-statused iff any capture is.
    from commoncrawl_spark.fixtures import AUTHORS as _AUTH

    author_case = "CASE doc_id % 10 " + " ".join(
        f"WHEN {k} THEN '{a.replace(chr(39), chr(39) * 2)}'"
        for k, a in enumerate(_AUTH)
    ) + " END"
    o["crawl_pipeline"] = f"""
        WITH d AS (
          SELECT doc_id, text,
                 'https://' || source || '.news.test/' || lang || '/'
                   || CAST(doc_id AS VARCHAR) || '/story' AS url
          FROM documents),
        caps AS (
          SELECT doc_id, unnest(range(0, doc_id % 3 + 1)) AS c
          FROM documents),
        ok200 AS (
          SELECT DISTINCT doc_id FROM caps WHERE (doc_id + c) % 11 <> 0)
        SELECT md5(url) AS id, url,
               'Doc ' || CAST(doc_id AS VARCHAR) || ' report' AS title,
               printf('%04d-%02d-%02dT%02d:00:00+00:00',
                      2019 + doc_id % 7, doc_id % 12 + 1, doc_id % 28 + 1,
                      doc_id % 24) AS publish_time,
               {author_case} AS author,
               text
        FROM d JOIN ok200 USING (doc_id)
        WHERE trim(text) <> ''
    """

    o["exact_dedup"] = f"""
        SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id FROM (
          SELECT doc_id,
                 md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
                   AS fingerprint
          FROM {_DOCS_DUP_SQL})
        GROUP BY fingerprint HAVING COUNT(*) >= 2
    """

    o["hour_histogram"] = """
        SELECT CAST(hour(ts) AS INTEGER) AS hour, COUNT(*) AS cnt
        FROM events GROUP BY 1 ORDER BY 1
    """

    sep = " || '|' || "
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        f"md5({sep.join(f's{b * 4 + j}' for j in range(4))}) AS bucket "
        f"FROM sigs"
        for b in range(BANDS)
    )
    o["minhash_buckets"] = f"""
        WITH base AS (
          SELECT doc_id, {sh_doc} AS sh
          FROM (SELECT doc_id, text FROM documents)),
        sigs AS (SELECT doc_id, {_sql_minhash_sigs()} FROM base)
        {band_rows}
    """

    # line_dedup: the same deterministic repeated-line synthesis, then
    # first-occurrence filtering with DuckDB's 1-based indexed lambda
    # (matches Spark's array_position == i + 1 over 0-based i)
    o["line_dedup"] = """
        WITH m AS (
          SELECT doc_id,
                 string_split(
                   text || chr(10) || text || chr(10)
                        || 'tail ' || CAST(doc_id AS VARCHAR)
                        || chr(10) || text,
                   chr(10)) AS l
          FROM documents),
        u AS (SELECT doc_id, len(l) AS n_lines,
                     list_filter(l, (x, i) -> list_position(l, x) = i) AS uq
              FROM m)
        SELECT doc_id, CAST(n_lines AS INTEGER) AS n_lines,
               CAST(len(uq) AS INTEGER) AS n_unique,
               array_to_string(uq, chr(10)) AS text
        FROM u
    """

    # near_dedup_incremental: the sig/band machinery computed
    # independently for the history and segment slices, candidates from
    # cross-slice band collisions, signature-component agreement / 16
    # as the Jaccard estimate
    def _band_rows_from(cte: str) -> str:
        return " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, "
            f"md5({sep.join(f's{b * 4 + j}' for j in range(4))}) AS bucket "
            f"FROM {cte}"
            for b in range(BANDS)
        )

    _sig_eq = " + ".join(
        f"CAST(ns.s{j} = hs.s{j} AS INT)" for j in range(NUM_HASHES))
    o["near_dedup_incremental"] = f"""
        WITH hist AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        newseg AS (
          SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, text FROM documents
          WHERE doc_id % 3 <> 0 AND doc_id % 7 = 1),
        hbase AS (SELECT doc_id, {sh_doc} AS sh FROM hist),
        nbase AS (SELECT doc_id, {sh_doc} AS sh FROM newseg),
        hsigs AS (SELECT doc_id, {_sql_minhash_sigs()} FROM hbase),
        nsigs AS (SELECT doc_id, {_sql_minhash_sigs()} FROM nbase),
        hbk AS ({_band_rows_from("hsigs")}),
        nbk AS ({_band_rows_from("nsigs")}),
        cand AS (
          SELECT DISTINCT n.doc_id AS new_id, h.doc_id AS matched_id
          FROM nbk n JOIN hbk h ON n.band = h.band AND n.bucket = h.bucket
          WHERE n.doc_id <> h.doc_id),
        est AS (
          SELECT c.new_id, c.matched_id,
                 round(CAST({_sig_eq} AS DOUBLE) / {NUM_HASHES}, 6)
                   AS est_jaccard
          FROM cand c
          JOIN nsigs ns ON ns.doc_id = c.new_id
          JOIN hsigs hs ON hs.doc_id = c.matched_id)
        SELECT new_id, matched_id, est_jaccard
        FROM est WHERE est_jaccard >= 0.5
    """

    # bm25_merged: the oracle ranks a from-scratch rebuild over the
    # MERGED corpus (history minus re-crawled + segment) — exactly what
    # new-wins-per-document index merging must equal
    o["bm25_merged"] = f"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          WHERE doc_id % 3 <> 0 AND doc_id % 10 <> 1
          UNION ALL
          SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, text || ' updated join scan revision' AS text
          FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 10 = 1),
        toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM corpus),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM corpus d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        qt AS (SELECT doc_id, token FROM toksv
               WHERE token IN ('join', 'hash', 'scan')),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM qt GROUP BY doc_id, token),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        per AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(tf.tf AS DOUBLE) * 2.2
                    / (CAST(tf.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        folded AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM per GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM folded)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 15
    """

    # near_dedup_pipeline: same sig/band machinery over the twins corpus,
    # then LSH collisions -> exact Jaccard (rounded to 6 like the engine)
    # -> greedy min-id-wins keep set
    o["near_dedup_pipeline"] = f"""
        WITH base AS (
          SELECT doc_id, {sh_doc} AS sh FROM {_DOCS2_SQL}),
        sigs AS (SELECT doc_id, {_sql_minhash_sigs()} FROM base),
        bks AS ({band_rows}),
        pairs AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bks x JOIN bks y ON x.band = y.band AND x.bucket = y.bucket
          WHERE x.doc_id < y.doc_id),
        losers AS (
          SELECT DISTINCT p.b
          FROM pairs p
          JOIN base xa ON xa.doc_id = p.a
          JOIN base yb ON yb.doc_id = p.b
          WHERE round(len(list_intersect(xa.sh, yb.sh))
                      / greatest(len(list_distinct(list_concat(xa.sh, yb.sh))), 1),
                      6) >= 0.8)
        SELECT doc_id FROM {_DOCS2_SQL}
        WHERE doc_id NOT IN (SELECT b FROM losers)
    """

    # host_pagerank: the engine's fixed-iteration recurrence unrolled as
    # CTEs — rank0 = 1, rank' = 0.15 + 0.85 * sum(rank/out_degree) over
    # incoming edges, dangling mass leaking exactly as in the operator
    _pr_iter = """
        SELECT n.node,
               0.15 + 0.85 * COALESCE(m.mass, 0) AS pr
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, SUM(r.pr / deg.deg) AS mass
          FROM e JOIN deg USING (src) JOIN {prev} r ON r.node = e.src
          GROUP BY e.dst) m USING (node)
    """
    # opic_importance: the batch-OPIC recurrence unrolled — cash0 = 1/n,
    # received = sum(cash/outdeg) over in-edges, dangling cash (nodes
    # absent from deg) recycled uniformly via the virtual page, history
    # accumulates the spent cash; importance = (hist+cash)/(T+1)
    _opic_iter = """
        SELECT n.node,
               COALESCE(m.recv, 0)
                 + (SELECT COALESCE(SUM(s.cash), 0)
                    FROM {prev} s LEFT JOIN deg d ON s.node = d.src
                    WHERE d.src IS NULL) / (SELECT n FROM nn) AS cash,
               p.hist + p.cash AS hist
        FROM nodes n
        JOIN {prev} p ON p.node = n.node
        LEFT JOIN (
          SELECT e.dst AS node, SUM(s.cash / d.deg) AS recv
          FROM e JOIN deg d USING (src) JOIN {prev} s ON s.node = e.src
          GROUP BY e.dst) m ON m.node = n.node
    """
    o["opic_importance"] = f"""
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 89 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 89, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        nn AS (SELECT COUNT(*) AS n FROM nodes),
        s0 AS (SELECT node, 1.0 / nn.n AS cash, CAST(0.0 AS DOUBLE) AS hist
               FROM nodes, nn),
        s1 AS ({_opic_iter.format(prev="s0")}),
        s2 AS ({_opic_iter.format(prev="s1")}),
        s3 AS ({_opic_iter.format(prev="s2")})
        SELECT node, ROUND(cash, 6) AS cash, ROUND(hist, 6) AS history,
               ROUND((hist + cash) / 4, 6) AS importance
        FROM s3
    """

    o["host_pagerank"] = f"""
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM nodes),
        r1 AS ({_pr_iter.format(prev="r0")}),
        r2 AS ({_pr_iter.format(prev="r1")}),
        r3 AS ({_pr_iter.format(prev="r2")})
        SELECT node, ROUND(pr, 6) AS pr FROM r3
    """

    # harmonic_hosts: exact ground truth for the HyperBall sketch walk —
    # a bounded recursive-CTE BFS (min path length per (u, v) pair up to
    # the radius), harmonic = SUM(1/d), ball = 1 + reachable sources.
    # Legal as an EXACT oracle because DataSketches HLL is exact in its
    # sparse/coupon regime and every ball here is <= 97 nodes; the V*E
    # pair blowup the operator exists to avoid is fine at oracle scale.
    o["harmonic_hosts"] = """
        WITH RECURSIVE e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
        -- union wrapped in a subquery: inside WITH RECURSIVE, a CTE
        -- body whose TOP-LEVEL op is UNION is parsed as the recursive
        -- initial/step split and silently duplicates rows.
        nodes AS (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t),
        walk(u, v, t) AS (
          SELECT src, dst, 1 FROM e
          UNION
          SELECT w.u, e.dst, w.t + 1
          FROM walk w JOIN e ON w.v = e.src
          WHERE w.t < 6),
        dist AS (
          SELECT u, v, MIN(t) AS d FROM walk WHERE u <> v GROUP BY u, v)
        SELECT n.node,
               CAST(1 + COUNT(dist.u) AS BIGINT) AS ball,
               ROUND(COALESCE(SUM(1.0 / dist.d), 0.0), 6) AS harmonic
        FROM nodes n LEFT JOIN dist ON dist.v = n.node
        GROUP BY n.node
    """

    # lpa_communities: the synchronous vote recurrence unrolled — per
    # round, (dst, label) vote counts then the per-node argmax via
    # QUALIFY row_number (count desc, label asc), exactly the operator's
    # min_by(label, struct(-count, label)) tie-break.
    _lpa_round = """
        v{i} AS (
          SELECT e.dst AS node, s.label, COUNT(*) AS c
          FROM e JOIN l{p} s ON e.src = s.node
          GROUP BY e.dst, s.label),
        l{i} AS (
          SELECT node, label FROM v{i}
          QUALIFY row_number()
            OVER (PARTITION BY node ORDER BY c DESC, label) = 1)"""
    o["lpa_communities"] = f"""
        WITH d AS (
          SELECT src, dst FROM (
            SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
        e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM d UNION ALL SELECT dst, src FROM d) u),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
        {",".join(_lpa_round.format(i=i, p=i - 1) for i in range(1, 5))}
        SELECT node, label AS community FROM l4
    """

    # triangle_hosts: each triangle counted once as its canonical
    # a<b<c triple (edges are canonical a<b pairs, so the three-way
    # self-join e1=(a,b), e2=(b,c), e3=(a,c) hits it exactly once);
    # per-node counts explode the triple, degree-only nodes come back
    # via the left join
    o["triangle_hosts"] = """
        WITH raw AS (
          SELECT doc_id % 97 AS s, (doc_id * doc_id + 1) % 97 AS d
          FROM documents
          UNION ALL
          SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents),
        und AS (
          SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
          FROM raw WHERE s <> d),
        deg AS (
          SELECT node, COUNT(*) AS degree FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und) n
          GROUP BY node),
        tri AS (
          SELECT e1.a AS u, e1.b AS v, e2.b AS w
          FROM und e1
          JOIN und e2 ON e2.a = e1.b
          JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        pn AS (
          SELECT node, COUNT(*) AS n_triangles FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT v FROM tri
            UNION ALL SELECT w FROM tri) t
          GROUP BY node)
        SELECT deg.node, deg.degree,
               COALESCE(pn.n_triangles, 0) AS n_triangles,
               CASE WHEN deg.degree > 1
                    THEN round(2.0 * COALESCE(pn.n_triangles, 0)
                               / (deg.degree * (deg.degree - 1)), 6)
                    ELSE 0.0 END AS clustering
        FROM deg LEFT JOIN pn USING (node)
    """

    # ip_asn_lookup: DuckDB can afford the declarative BETWEEN join at
    # this scale — the binning rewrite is the Spark scale path, not a
    # semantic; ranges are disjoint so LEFT JOIN is the winner rule
    o["ip_asn_lookup"] = """
        WITH pts AS (
          SELECT event_id,
                 CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)),
                                         1, 4))::INTEGER % 62500
                      AS BIGINT) AS ip
          FROM events),
        rng AS (
          SELECT n_nationkey * 2500 AS lo,
                 n_nationkey * 2500 + 1999 AS hi,
                 n_name AS asn
          FROM nation)
        SELECT p.event_id, p.ip, r.lo AS r_lo, r.hi AS r_hi,
               r.asn AS r_asn
        FROM pts p LEFT JOIN rng r ON p.ip BETWEEN r.lo AND r.hi
    """

    # event_funnel: the chained min-after-t recurrence as sequential
    # CTEs — same greedy earliest-chain semantics as the k-1 joins
    o["event_funnel"] = """
        WITH s1 AS (SELECT user_id AS u, MIN(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY 1),
        s2 AS (SELECT e.user_id AS u, MIN(e.ts) AS t
               FROM events e JOIN s1 ON s1.u = e.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        s3 AS (SELECT e.user_id AS u, MIN(e.ts) AS t
               FROM events e JOIN s2 ON s2.u = e.user_id
               WHERE e.event_type = 'signup' AND e.ts > s2.t GROUP BY 1),
        s4 AS (SELECT e.user_id AS u, MIN(e.ts) AS t
               FROM events e JOIN s3 ON s3.u = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
        base AS (SELECT COUNT(*) AS b FROM s1),
        c AS (
          SELECT 1 AS step_idx, 'view' AS step,
                 (SELECT COUNT(*) FROM s1) AS n_users
          UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
          UNION ALL SELECT 3, 'signup', (SELECT COUNT(*) FROM s3)
          UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4))
        SELECT step_idx, step, n_users,
               CASE WHEN b > 0 THEN round(n_users / b, 6)
                    ELSE 0.0 END AS conversion
        FROM c, base
    """

    # retention: period key = epoch_days // 7 so week arithmetic is
    # integer subtraction in both engines; cohort label is the
    # epoch-aligned week-start date
    o["retention"] = """
        WITH ev AS (SELECT user_id AS u,
                           (CAST(ts AS DATE) - DATE '1970-01-01') // 7
                             AS mk
                    FROM events),
        firsts AS (SELECT u, MIN(mk) AS c0 FROM ev GROUP BY u),
        act AS (SELECT DISTINCT u, mk FROM ev),
        coh AS (SELECT a.u, f.c0, a.mk - f.c0 AS periods_since
                FROM act a JOIN firsts f USING (u)),
        sizes AS (SELECT c0, COUNT(*) AS sz FROM firsts GROUP BY c0),
        agg AS (SELECT c0, periods_since, COUNT(*) AS n_users
                FROM coh GROUP BY 1, 2)
        SELECT CAST(DATE '1970-01-01' + CAST(c0 * 7 AS INTEGER)
                    AS VARCHAR) AS cohort,
               periods_since, n_users,
               round(n_users / sz, 6) AS retention
        FROM agg JOIN sizes USING (c0)
    """

    # cms_word_counts: the CMS matrix replayed cell-for-cell — same
    # md5 row hashes ('0x'||hex ::BIGINT == conv(hex,16,10)), same
    # min-over-rows estimate; every probed word was inserted so the
    # missing-bucket coalesce path never fires
    o["cms_word_counts"] = f"""
        WITH words AS (
          SELECT unnest({toks_doc}) AS w FROM documents),
        ds AS (SELECT unnest(range(0, 4)) AS d),
        cells AS (
          SELECT ds.d,
                 ('0x' || substring(md5(CAST(ds.d AS VARCHAR) || chr(31)
                                        || w), 1, 8))::BIGINT % 256
                   AS bucket,
                 COUNT(*) AS cnt
          FROM words, ds GROUP BY 1, 2),
        probes AS (SELECT DISTINCT w FROM words),
        pb AS (
          SELECT p.w, ds.d,
                 ('0x' || substring(md5(CAST(ds.d AS VARCHAR) || chr(31)
                                        || p.w), 1, 8))::BIGINT % 256
                   AS bucket
          FROM probes p, ds)
        SELECT pb.w AS word, MIN(cells.cnt) AS est
        FROM pb JOIN cells USING (d, bucket)
        GROUP BY 1
    """

    # mojibake_repair: the same longest-first replace chain and
    # length-delta counts, built programmatically from MOJIBAKE_MAP so
    # Spark and SQL literally share the scar table
    from commoncrawl_spark.functions.text import MOJIBAKE_MAP

    def _moji_q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    _moji_fix = "t"
    for _bad, _good in MOJIBAKE_MAP:
        _moji_fix = (f"replace({_moji_fix}, {_moji_q(_bad)}, "
                     f"{_moji_q(_good)})")

    def _moji_cnt(col: str) -> str:
        return " + ".join(
            f"CAST((length({col}) - length(replace({col}, {_moji_q(b)}, "
            f"''))) // {len(b)} AS BIGINT)"
            for b, _ in MOJIBAKE_MAP)

    o["mojibake_repair"] = f"""
        WITH dam AS (
          SELECT doc_id,
                 substring(text, 1, 120)
                   || CASE WHEN doc_id % 3 = 0
                           THEN {_moji_q(_MOJI_SNIPPET)} ELSE '' END AS t
          FROM documents),
        fx AS (SELECT doc_id, t, {_moji_fix} AS f FROM dam)
        SELECT doc_id, {_moji_cnt("t")} AS n_scars,
               length(f) AS repaired_len,
               {_moji_cnt("f")} AS n_residue,
               substring(f, 1, 160) AS snippet
        FROM fx
    """

    # logreg_quality: 8 GD rounds unrolled — weight CTEs wt0..wt4,
    # per-round sigmoid CTEs; gradient sums on 1e-6-quantized BIGINTs,
    # every margin/weight rounded 6dp, matching logreg_train exactly
    _lg_grad = (
        "round(MIN(w.{c}) - 4.0 * round(CAST(SUM(CAST(round((p - y){x}"
        " * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(*), 6),"
        " 6) AS {c}")
    _lg_iter = """
        pp{i} AS (
          SELECT f.*, round(1.0 / (1.0 + exp(-round(
            w.b + w.c1 * f.x1 + w.c2 * f.x2 + w.c3 * f.x3, 6))), 6) AS p
          FROM f, wt{p} w),
        wt{i} AS (
          SELECT """ + ", ".join(
        _lg_grad.format(c=c, x=x)
        for c, x in [("b", " * 1.0"), ("c1", " * x1"),
                     ("c2", " * x2"), ("c3", " * x3")]) + """
          FROM pp{i}, wt{p} w)"""
    o["logreg_quality"] = f"""
        WITH f AS (
          SELECT doc_id,
                 CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                 round(length(text) / 1000.0, 6) AS x1,
                 round(len({toks_doc}) / 100.0, 6) AS x2,
                 round(((length(lower(text))
                         - length(replace(lower(text), 'the', ''))) // 3)
                       * 10.0 / (len({toks_doc}) + 1.0), 6) AS x3
          FROM documents),
        wt0 AS (SELECT 0.0 AS b, 0.0 AS c1, 0.0 AS c2, 0.0 AS c3),
        {",".join(_lg_iter.format(i=i, p=i - 1) for i in range(1, 9))}
        SELECT doc_id, y, p, CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred
        FROM (
          SELECT f.*, round(1.0 / (1.0 + exp(-round(
            w.b + w.c1 * f.x1 + w.c2 * f.x2 + w.c3 * f.x3, 6))), 6) AS p
          FROM f, wt8 w) s
    """

    # trustrank_hosts: the TrustRank recurrence unrolled as CTEs — bias
    # = 1/|S| on seeds else 0, t0 = bias, t' = 0.15*bias + 0.85*mass;
    # dangling mass leaks exactly as in host_pagerank
    _tr_iter = """
        SELECT n.node, n.bias,
               0.15 * n.bias + 0.85 * COALESCE(m.mass, 0) AS tr
        FROM nodes n LEFT JOIN (
          SELECT e.dst AS node, SUM(r.tr / deg.deg) AS mass
          FROM e JOIN deg USING (src) JOIN {prev} r ON r.node = e.src
          GROUP BY e.dst) m USING (node)
    """
    o["trustrank_hosts"] = f"""
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        s AS (
          SELECT DISTINCT doc_id % 97 AS node FROM documents
          WHERE (doc_id % 97) % 10 = 0),
        ns AS (SELECT COUNT(*) AS n FROM s),
        nodes AS (
          SELECT u.node,
                 CASE WHEN s.node IS NOT NULL
                      THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS bias
          FROM (SELECT src AS node FROM e UNION SELECT dst FROM e
                UNION SELECT node FROM s) u
          LEFT JOIN s ON s.node = u.node),
        t0 AS (SELECT node, bias, bias AS tr FROM nodes),
        t1 AS ({_tr_iter.format(prev="t0")}),
        t2 AS ({_tr_iter.format(prev="t1")}),
        t3 AS ({_tr_iter.format(prev="t2")})
        SELECT node, ROUND(tr, 6) AS trust FROM t3
    """

    # spam_mass_hosts: both unrolled recurrences composed in one WITH
    # (the trust iteration rewritten against tnodes to avoid the name
    # clash), then the exact normalized-difference arithmetic; the
    # candidate boolean thresholds the ROUNDED mass like the operator
    _tr_iter_t = _tr_iter.replace("FROM nodes n", "FROM tnodes n")
    o["spam_mass_hosts"] = f"""
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM nodes),
        r1 AS ({_pr_iter.format(prev="r0")}),
        r2 AS ({_pr_iter.format(prev="r1")}),
        r3 AS ({_pr_iter.format(prev="r2")}),
        s AS (
          SELECT DISTINCT doc_id % 97 AS node FROM documents
          WHERE (doc_id % 97) % 10 = 0),
        ns AS (SELECT COUNT(*) AS n FROM s),
        tnodes AS (
          SELECT u.node,
                 CASE WHEN s.node IS NOT NULL
                      THEN 1.0 / (SELECT n FROM ns) ELSE 0.0 END AS bias
          FROM (SELECT src AS node FROM e UNION SELECT dst FROM e
                UNION SELECT node FROM s) u
          LEFT JOIN s ON s.node = u.node),
        t0 AS (SELECT node, bias, bias AS tr FROM tnodes),
        t1 AS ({_tr_iter_t.format(prev="t0")}),
        t2 AS ({_tr_iter_t.format(prev="t1")}),
        t3 AS ({_tr_iter_t.format(prev="t2")}),
        sums AS (
          SELECT (SELECT SUM(pr) FROM r3) AS ps,
                 (SELECT SUM(tr) FROM t3) AS ts)
        SELECT p.node, ROUND(p.pr, 6) AS pr, ROUND(t.tr, 6) AS trust,
               ROUND((p.pr / ps - t.tr / ts) / (p.pr / ps), 6)
                 AS spam_mass,
               ROUND((p.pr / ps - t.tr / ts) / (p.pr / ps), 6) >= 0.5
                 AS is_candidate
        FROM r3 p JOIN t3 t USING (node) CROSS JOIN sums
    """

    # domain_webgraph: hosts regenerated from the same CASE templates,
    # the PSL-lite rule replayed over string_split labels (DuckDB lists
    # are 1-based; labels[n-1] is the second-level label), intra-domain
    # pairs dropped before the count
    _sql_regdom = """
        CASE WHEN len(ls) <= 1 THEN h
             WHEN len(ls) >= 3 AND length(ls[len(ls)]) = 2
                  AND ls[len(ls) - 1] IN
                      ('co','com','net','org','gov','ac','edu')
               THEN array_to_string(ls[len(ls) - 2 : len(ls)], '.')
             ELSE array_to_string(ls[len(ls) - 1 : len(ls)], '.') END
    """
    o["domain_webgraph"] = f"""
        WITH hosts AS (
          SELECT
            CASE WHEN doc_id % 3 = 0 THEN source || '.news.test'
                 WHEN doc_id % 3 = 1 THEN 'www.' || source || '.co.uk'
                 ELSE source || '.org' END AS src_h,
            CASE WHEN doc_id % 4 = 0
                   THEN 'ext-' || CAST(doc_id % 5 AS VARCHAR) || '.ac.jp'
                 WHEN doc_id % 4 = 1 THEN source || '.co.uk'
                 WHEN doc_id % 4 = 2 THEN 'static.media.net'
                 ELSE 'en.' || source || '.org' END AS dst_h
          FROM documents),
        doms AS (
          SELECT
            (SELECT {_sql_regdom} FROM (SELECT src_h AS h,
               string_split(src_h, '.') AS ls)) AS src_domain,
            (SELECT {_sql_regdom} FROM (SELECT dst_h AS h,
               string_split(dst_h, '.') AS ls)) AS dst_domain
          FROM hosts)
        SELECT src_domain, dst_domain, count(*) AS n_links
        FROM doms WHERE src_domain <> dst_domain
        GROUP BY src_domain, dst_domain
    """

    # page_directives: every flag recomputed from the generating
    # templates — doc_id%3 drives the meta-robots case, %2 the
    # canonical link (absolutized root-relative), %4 the nofollow
    # anchor; n_links is always the two template anchors
    o["page_directives"] = """
        SELECT 'https://pd' || CAST(doc_id % 5 AS VARCHAR) || '.test/a/'
                 || CAST(doc_id AS VARCHAR) AS url,
               (doc_id % 3 = 0) AS noindex,
               (doc_id % 3 = 0) AS nofollow,
               CASE WHEN doc_id % 2 = 0
                    THEN 'https://pd' || CAST(doc_id % 5 AS VARCHAR)
                         || '.test/c/' || CAST(doc_id % 13 AS VARCHAR)
               END AS canonical_url,
               2 AS n_links,
               CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END
                 AS n_nofollow_links
        FROM documents
    """

    # mime_sniff: the expected type per template case — the oracle is
    # the generating map, so any sniffer branch misfire mismatches
    o["mime_sniff"] = """
        SELECT doc_id,
               CASE doc_id % 7
                 WHEN 0 THEN 'application/pdf'
                 WHEN 1 THEN 'image/gif'
                 WHEN 2 THEN 'text/html'
                 WHEN 3 THEN 'text/html'
                 WHEN 4 THEN 'application/json'
                 WHEN 5 THEN 'application/xml'
                 ELSE 'text/plain'
               END AS mime
        FROM documents
    """

    # weighted_sample: the E-S key replayed exactly — same md5-uniform
    # (+0.5 so ln never sees 0), same ln/weight division, same 6dp
    # rounding, ties broken by doc_id in both engines
    o["weighted_sample"] = """
        WITH d AS (
          SELECT doc_id,
                 CAST(len(list_filter(
                   string_split_regex(text, '\\s+'), x -> x <> ''))
                 AS BIGINT) AS n_tokens
          FROM documents),
        keyed AS (
          SELECT doc_id, n_tokens,
                 round(ln(
                   (CAST(('0x' || substring(
                      md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                    AS DOUBLE) + 0.5) / 4294967296.0)
                   / CAST(n_tokens AS DOUBLE), 6) AS es_key
          FROM d WHERE n_tokens > 0)
        SELECT doc_id, n_tokens, es_key
        FROM keyed ORDER BY es_key DESC, doc_id LIMIT 100
    """

    # redirect_resolution: the chain walked step-by-step with a
    # recursive CTE bounded at 16 hops; the furthest row per url is the
    # verdict — terminal cur = resolved with the exact hop count,
    # still-redirecting cur (too long, or a loop) = unresolved NULLs
    o["redirect_resolution"] = """
        WITH RECURSIVE e AS (
          SELECT 'https://r.test/u/' || CAST(doc_id AS VARCHAR) AS url,
                 'https://r.test/u/' || CAST(doc_id - 1 AS VARCHAR) AS loc
          FROM documents WHERE doc_id % 50 <> 0
          UNION ALL
          SELECT 'https://r.test/u/' || CAST(doc_id AS VARCHAR),
                 'https://r.test/w/' || CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % 100 = 0
          UNION ALL
          SELECT 'https://r.test/w/' || CAST(doc_id AS VARCHAR),
                 'https://r.test/u/' || CAST(doc_id AS VARCHAR)
          FROM documents WHERE doc_id % 100 = 0),
        r AS (SELECT url, MIN(loc) AS cur FROM e GROUP BY url),
        chain AS (
          SELECT url, cur, CAST(1 AS BIGINT) AS hops FROM r
          UNION ALL
          SELECT c.url, r2.cur, c.hops + 1
          FROM chain c JOIN r r2 ON r2.url = c.cur
          WHERE c.hops < 16),
        fin AS (
          SELECT url, arg_max(cur, hops) AS cur, MAX(hops) AS hops
          FROM chain GROUP BY url),
        v AS (
          SELECT f.url, f.cur, f.hops,
                 (s.url IS NULL) AS resolved
          FROM fin f LEFT JOIN r s ON s.url = f.cur)
        SELECT url,
               CASE WHEN resolved THEN cur END AS final_url,
               CASE WHEN resolved THEN hops END AS n_hops,
               resolved
        FROM v
    """

    # hits_scores: the engine's fixed-iteration HITS recurrence unrolled
    # as CTEs — auth' = L1-normalized sum of incoming hubs, hub' =
    # L1-normalized sum of the NEW outgoing auths (classic in-place
    # order), hub0 = 1. Same edge graph as host_pagerank.
    _hits_ctes = []
    _prev_hub = "s0"
    for _i in (1, 2, 3):
        _hits_ctes.append(
            f"a{_i}m AS (SELECT e.dst AS node, SUM(s.hub) AS a "
            f"FROM e JOIN {_prev_hub} s ON s.node = e.src GROUP BY e.dst)")
        _hits_ctes.append(
            f"a{_i} AS (SELECT n.node, COALESCE(m.a, 0)"
            f" / (SELECT SUM(a) FROM a{_i}m) AS auth "
            f"FROM nodes n LEFT JOIN a{_i}m m USING (node))")
        _hits_ctes.append(
            f"h{_i}m AS (SELECT e.src AS node, SUM(a.auth) AS h "
            f"FROM e JOIN a{_i} a ON a.node = e.dst GROUP BY e.src)")
        _hits_ctes.append(
            f"h{_i} AS (SELECT n.node, COALESCE(m.h, 0)"
            f" / (SELECT SUM(h) FROM h{_i}m) AS hub "
            f"FROM nodes n LEFT JOIN h{_i}m m USING (node))")
        _prev_hub = f"h{_i}"
    _hits_chain = ",\n        ".join(_hits_ctes)
    o["hits_scores"] = f"""
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL),
        nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        s0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes),
        {_hits_chain}
        SELECT n.node, ROUND(h3.hub, 6) AS hub, ROUND(a3.auth, 6) AS auth
        FROM nodes n
        JOIN h3 ON h3.node = n.node
        JOIN a3 ON a3.node = n.node
    """

    # dedup_clusters: same verified-pair machinery, then transitive
    # closure via a recursive CTE — min reachable doc_id = the component
    # label the engine's pointer-doubled label propagation computes
    o["dedup_clusters"] = f"""
        WITH RECURSIVE base AS (
          SELECT doc_id, {sh_doc} AS sh FROM {_DOCS2_SQL}),
        sigs AS (SELECT doc_id, {_sql_minhash_sigs()} FROM base),
        bks AS ({band_rows}),
        pairs AS (
          SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
          FROM bks x JOIN bks y ON x.band = y.band AND x.bucket = y.bucket
          WHERE x.doc_id < y.doc_id),
        vpairs AS (
          SELECT p.a, p.b
          FROM pairs p
          JOIN base xa ON xa.doc_id = p.a
          JOIN base yb ON yb.doc_id = p.b
          WHERE round(len(list_intersect(xa.sh, yb.sh))
                      / greatest(len(list_distinct(list_concat(xa.sh, yb.sh))), 1),
                      6) >= 0.8),
        e AS (SELECT a AS id, b AS nb FROM vpairs
              UNION SELECT b, a FROM vpairs),
        reach(id, lbl) AS (
          SELECT id, id FROM (SELECT DISTINCT id FROM e)
          UNION
          SELECT e.id, r.lbl FROM e JOIN reach r ON r.id = e.nb),
        lab AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id)
        SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
        FROM {_DOCS2_SQL} d LEFT JOIN lab l ON l.id = d.doc_id
    """

    # cluster_reps: the same cluster derivation, then argmax(score,
    # -doc_id) per cluster with score = token count (FineWeb keep rule)
    o["cluster_reps"] = o["dedup_clusters"].rstrip().rstrip(
    ).replace(
        "lab AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id)\n"
        "        SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster\n"
        f"        FROM {_DOCS2_SQL} d LEFT JOIN lab l ON l.id = d.doc_id",
        "lab AS (SELECT id, MIN(lbl) AS cluster FROM reach GROUP BY id),\n"
        "        assign AS (\n"
        "          SELECT d.doc_id,\n"
        "                 COALESCE(l.cluster, d.doc_id) AS cluster,\n"
        f"                 CAST(len({_SQL_TOKS.format(t='d.text')}) AS"
        " BIGINT) AS score\n"
        f"          FROM {_DOCS2_SQL} d LEFT JOIN lab l ON l.id ="
        " d.doc_id)\n"
        "        SELECT cluster, doc_id AS rep_doc_id, n_members,\n"
        "               score AS rep_score\n"
        "        FROM (SELECT *,\n"
        "                     count(*) OVER (PARTITION BY cluster)\n"
        "                       AS n_members,\n"
        "                     row_number() OVER (PARTITION BY cluster\n"
        "                       ORDER BY score DESC, doc_id ASC) AS rn\n"
        "              FROM assign)\n"
        "        WHERE rn = 1",
    )

    # cdx_harvest: the oracle skips the JSONL byte round-trip (JSON parse
    # is the identity on these records) and replays the same fold over the
    # same (crawl, page, line_no) arrival order; line_no = the record's
    # position within its page body, which Spark gets from posexplode and
    # the oracle from a rank over the same ordering key (event_id)
    from commoncrawl_spark.fixtures import CRAWLS as _ALL_CRAWLS

    _CRAWLS3 = _ALL_CRAWLS[:3]
    crawl_case = (
        "CASE event_id % 3 "
        + " ".join(f"WHEN {k} THEN '{c}'" for k, c in enumerate(_CRAWLS3[:2]))
        + f" ELSE '{_CRAWLS3[2]}' END"
    )
    o["cdx_harvest"] = f"""
        WITH cdx AS ({_EV_CDX_SQL}),
        recs AS (
          SELECT event_id, url, status, mime_detected, length, "timestamp",
                 {crawl_case} AS crawl,
                 CAST(event_id % 4 AS INTEGER) AS page,
                 CAST(row_number() OVER (
                        PARTITION BY event_id % 3, event_id % 4
                        ORDER BY event_id) - 1 AS INTEGER) AS line_no
          FROM cdx),
        g AS (
          SELECT {_sql_canon("url")} AS canon_url,
                 list(struct_pack(
                        url := url, status := status,
                        mime_detected := mime_detected, length := length,
                        "timestamp" := "timestamp", crawl := crawl,
                        page := page, line_no := line_no)
                      ORDER BY crawl, page, line_no) AS rs
          FROM recs GROUP BY 1),
        w AS (SELECT canon_url, {_FOLD_SQL} AS win FROM g)
        SELECT canon_url, win['url'] AS url, win['status'] AS status,
               win['mime_detected'] AS mime_detected,
               win['length'] AS length, win['timestamp'] AS "timestamp",
               win['crawl'] AS crawl, win['page'] AS page,
               win['line_no'] AS line_no
        FROM w
    """

    o["task_fanout"] = """
        WITH idx AS (
          SELECT 'CC-MAIN-2024-' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0')
                   AS idxname,
                 n_nationkey % 7 + 1 AS pages, n_nationkey
          FROM nation),
        keep AS (SELECT * FROM idx WHERE n_nationkey % 5 <> 0),
        fanned AS (SELECT idxname, unnest(range(0, pages)) AS page FROM keep)
        SELECT idxname AS "index", CAST(page AS INTEGER) AS page,
               'https://index.commoncrawl.org/' || idxname
                 || '-index?url=example.org/*&output=json&page='
                 || CAST(page AS VARCHAR) AS url
        FROM fanned
    """

    from commoncrawl_spark.fixtures import KEYWORDS as _kw_list

    def _kw_case(shift: int) -> str:
        whens = " ".join(f"WHEN {k} THEN '{w}'" for k, w in enumerate(_kw_list))
        return f"CASE (doc_id + {shift}) % 12 {whens} END"

    _pos = (
        "len(regexp_extract_all(lower(tagstr), '\\bclimate\\b'))"
        " + len(regexp_extract_all(lower(tagstr), '\\bai\\b'))"
    )
    _neg = (
        "len(regexp_extract_all(lower(tagstr), '\\bmarkets\\b'))"
        " + len(regexp_extract_all(lower(tagstr), '\\bfootball\\b'))"
    )
    # tag arrays reconstructed from the deterministic page layout:
    # signposting [kw1] (Home excluded), section [kw2], keywords [kw1,kw3]
    o["tag_keyword_filter"] = f"""
        WITH t AS (
          SELECT doc_id,
                 {_kw_case(0)} || ' ' || {_kw_case(4)} || ' '
                   || {_kw_case(0)} || ' ' || {_kw_case(7)} AS tagstr
          FROM documents),
        scored AS (SELECT doc_id, tagstr, {_pos} AS pos, {_neg} AS neg FROM t)
        SELECT doc_id, tagstr, pos, neg FROM scored
        WHERE (neg = 0 AND pos >= 1) OR pos > neg
    """

    o["ngram_jaccard"] = f"""
        WITH sh AS (SELECT doc_id, {sh_doc} AS s FROM documents),
        n AS (SELECT COUNT(*) // 2 AS half FROM documents)
        SELECT x.doc_id AS a, y.doc_id AS b,
               round(len(list_intersect(x.s, y.s))
                     / greatest(len(list_distinct(list_concat(x.s, y.s))), 1), 6)
                 AS jaccard
        FROM sh x JOIN sh y ON y.doc_id = x.doc_id + (SELECT half FROM n)
        WHERE x.doc_id < (SELECT half FROM n)
    """

    # ssjoin_pairs: brute-force ground truth for the prefix-filtered
    # join — candidates are every pair sharing >= 1 shingle (lossless
    # for threshold > 0 since J >= t > 0 needs a shared shingle), then
    # exact intersection/union arithmetic, rounded 6dp before the
    # threshold cut exactly as the operator does.
    o["ssjoin_pairs"] = f"""
        WITH s AS (SELECT doc_id, {sh_doc} AS sh FROM {_DOCS2_SQL}),
        e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                 FROM e x JOIN e y ON x.g = y.g AND x.doc_id < y.doc_id),
        j AS (SELECT a, b,
                round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                      / greatest(len(list_distinct(
                            list_concat(sa.sh, sb.sh))), 1), 6) AS jaccard
              FROM cand
              JOIN s sa ON sa.doc_id = cand.a
              JOIN s sb ON sb.doc_id = cand.b)
        SELECT a, b, jaccard FROM j WHERE jaccard >= 0.8
    """

    # containment_pairs: brute force is the oracle (the prefix filter
    # is an optimization, not a semantic); both directions kept
    o["containment_pairs"] = f"""
        WITH ct AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 2000000,
                 array_to_string(
                   ws[1:CAST(greatest(10, floor(len(ws) * 0.4)) AS INT)],
                   ' ')
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS ws
                FROM documents) t
          WHERE doc_id % 5 = 0),
        s AS (SELECT doc_id, {sh_doc} AS sh FROM ct),
        e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                 FROM e x JOIN e y ON x.g = y.g
                 WHERE x.doc_id <> y.doc_id),
        j AS (SELECT a, b,
                round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                      / greatest(len(sa.sh), 1), 6) AS containment,
                round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                      / greatest(len(list_distinct(
                            list_concat(sa.sh, sb.sh))), 1), 6) AS jaccard
              FROM cand
              JOIN s sa ON sa.doc_id = cand.a
              JOIN s sb ON sb.doc_id = cand.b)
        SELECT a, b, containment, jaccard FROM j WHERE containment >= 0.9
    """

    # lsh_recall: ground truth = the brute-force exact join (as in
    # ssjoin_pairs), probe = the same banded-signature bucket collisions
    # minhash_buckets oracles, hit = their equi-join; recall rounded 6dp
    # like the operator side.
    o["lsh_recall"] = f"""
        WITH base AS (SELECT doc_id, {sh_doc} AS sh FROM {_DOCS2_SQL}),
        sigs AS (SELECT doc_id, {_sql_minhash_sigs()} FROM base),
        bks AS ({band_rows}),
        cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                 FROM bks x JOIN bks y
                   ON x.band = y.band AND x.bucket = y.bucket
                 WHERE x.doc_id < y.doc_id),
        e AS (SELECT doc_id, unnest(sh) AS g FROM base),
        tc AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
               FROM e x JOIN e y ON x.g = y.g AND x.doc_id < y.doc_id),
        truth AS (
          SELECT tc.a, tc.b FROM tc
          JOIN base sa ON sa.doc_id = tc.a
          JOIN base sb ON sb.doc_id = tc.b
          WHERE round(len(list_intersect(sa.sh, sb.sh)) * 1.0
                      / greatest(len(list_distinct(
                            list_concat(sa.sh, sb.sh))), 1), 6) >= 0.8),
        hit AS (SELECT t.a, t.b FROM truth t
                JOIN cand c ON t.a = c.a AND t.b = c.b)
        SELECT (SELECT COUNT(*) FROM truth) AS truth_pairs,
               (SELECT COUNT(*) FROM cand) AS lsh_candidates,
               (SELECT COUNT(*) FROM hit) AS hit_pairs,
               ROUND((SELECT COUNT(*) FROM hit) * 1.0
                     / GREATEST((SELECT COUNT(*) FROM truth), 1), 6)
                 AS recall
    """

    # pmi_collocations: identical sum-of-logs arithmetic (same textual
    # association order as the Spark expression — IEEE + is order
    # sensitive), M = all adjacent pairs from array lengths, top-k on
    # the rounded value with the same (w1, w2) tie-break.
    o["pmi_collocations"] = f"""
        WITH t AS (SELECT {_SQL_TOKS.format(t='text')} AS t FROM documents),
        uni AS (SELECT w, COUNT(*) AS c
                FROM (SELECT unnest(t) AS w FROM t) u GROUP BY w),
        n AS (SELECT SUM(c) AS _n FROM uni),
        m AS (SELECT SUM(GREATEST(len(t) - 1, 0)) AS _m FROM t),
        bi AS (SELECT b, COUNT(*) AS c12 FROM (
                 SELECT unnest(list_transform(range(1, len(t)),
                                i -> t[i] || ' ' || t[i + 1])) AS b
                 FROM t) x
               GROUP BY b HAVING COUNT(*) >= 20),
        s AS (SELECT split_part(b, ' ', 1) AS w1,
                     split_part(b, ' ', 2) AS w2, c12 FROM bi)
        SELECT s.w1, s.w2, s.c12,
               ROUND(ln(s.c12) + 2 * ln((SELECT _n FROM n))
                     - ln((SELECT _m FROM m)) - ln(u1.c) - ln(u2.c), 6)
                 AS pmi
        FROM s JOIN uni u1 ON u1.w = s.w1 JOIN uni u2 ON u2.w = s.w2
        ORDER BY pmi DESC, s.w1, s.w2 LIMIT 100
    """

    # readability: the same vowel-run syllable heuristic and sentence
    # split as list lambdas; arithmetic in the identical textual order
    # (IEEE + / * are order-sensitive), 6dp round.
    o["readability"] = f"""
        WITH t AS (
          SELECT doc_id, {_SQL_TOKS.format(t='text')} AS t, lower(text) AS low
          FROM documents),
        s AS (
          SELECT doc_id,
                 len(t) AS n_words,
                 len(list_filter(string_split_regex(low, '[.!?]+'),
                     x -> regexp_matches(x, '[a-z0-9]'))) AS n_sentences,
                 CAST(COALESCE(list_sum(list_transform(t, w ->
                     GREATEST(len(list_filter(
                         string_split_regex(w, '[^aeiouy]+'),
                         x -> x <> '')), 1))), 0) AS BIGINT) AS n_syllables
          FROM t)
        SELECT doc_id, n_words, n_sentences, n_syllables,
               ROUND(206.835
                     - 1.015 * (n_words / GREATEST(n_sentences, 1))
                     - 84.6 * (n_syllables / GREATEST(n_words, 1)), 6)
                 AS reading_ease,
               ROUND(0.39 * (n_words / GREATEST(n_sentences, 1))
                     + 11.8 * (n_syllables / GREATEST(n_words, 1))
                     - 15.59, 6) AS fk_grade
        FROM s
    """

    o["simhash"] = f"""
        SELECT doc_id, {_sql_simhash(toks_doc)} AS simhash FROM documents
    """

    o["simhash_neardup"] = f"""
        WITH s AS (
          SELECT doc_id, {_sql_simhash(_SQL_TOKS.format(t="text"))} AS sim
          FROM {_DOCS2_SQL})
        SELECT a.doc_id AS a, b.doc_id AS b,
               bit_count(xor(a.sim, b.sim)) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """

    o["embedding_topk"] = f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 {_sql_cosine("q.v", "n.v")} AS cosine,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_sql_cosine("q.v", "n.v")} DESC, n.vec_id) AS rank
          FROM c q, c n WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id)
        WHERE rank <= 5
    """

    # feed_discovery: both regexes + the MIME-kind map replayed
    o["feed_discovery"] = r"""
        WITH page AS (
          SELECT 'https://' || source || '.org/p/'
                 || CAST(doc_id AS VARCHAR) AS url,
                 '<html><head>'
                 || CASE WHEN doc_id % 9 = 0 THEN ''
                    WHEN doc_id % 2 = 0 THEN
                      '<link rel="alternate" type="application/rss+xml" href="https://'
                      || source || '.org/feed/' || CAST(doc_id AS VARCHAR)
                      || '"/>'
                    ELSE
                      '<link type="application/atom+xml" rel="alternate" href="https://'
                      || source || '.org/atom/' || CAST(doc_id AS VARCHAR)
                      || '"/>' END
                 || '<link rel="stylesheet" type="application/rss+xml" href="/decoy.css">'
                 || '</head><body></body></html>' AS html
          FROM documents),
        tags AS (
          SELECT url,
                 unnest(regexp_extract_all(html, '(?i)<link\b([^>]*)>', 1))
                   AS tg
          FROM page)
        SELECT url,
               CASE lower(regexp_extract(tg, '(?i)type="([^"]+)"', 1))
                    WHEN 'application/rss+xml' THEN 'rss'
                    WHEN 'application/atom+xml' THEN 'atom' END
                 AS feed_kind,
               regexp_extract(tg, '(?i)href="([^"]+)"', 1) AS feed_url
        FROM tags
        WHERE lower(regexp_extract(tg, '(?i)rel="([^"]+)"', 1))
                = 'alternate'
          AND lower(regexp_extract(tg, '(?i)type="([^"]+)"', 1))
                IN ('application/rss+xml', 'application/atom+xml')
          AND regexp_extract(tg, '(?i)href="([^"]+)"', 1) <> ''
    """

    # coverage_gap: declared set, crawled subset, NOT IN, host rollup
    o["coverage_gap"] = """
        WITH declared AS (
          SELECT source || '.org' AS host,
                 'https://' || source || '.org/' || p || '/'
                 || CAST(doc_id AS VARCHAR) AS url
          FROM documents, unnest(['p', 'q']) AS t(p)),
        seen AS (
          SELECT 'https://' || source || '.org/p/'
                 || CAST(doc_id AS VARCHAR) AS url
          FROM documents WHERE doc_id % 3 <> 0),
        gap AS (
          SELECT host, count(*) AS n_gap FROM declared
          WHERE url NOT IN (SELECT url FROM seen) GROUP BY host)
        SELECT d.host, count(*) AS n_declared,
               CAST(coalesce(any_value(g.n_gap), 0) AS BIGINT) AS n_gap,
               round(coalesce(any_value(g.n_gap), 0)
                     / CAST(count(*) AS DOUBLE), 6) AS gap_share
        FROM declared d LEFT JOIN gap g USING (host)
        GROUP BY d.host
    """

    # delete_read: merge-on-read == the survivors' aggregate
    o["delete_read"] = """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents WHERE doc_id % 7 <> 0 GROUP BY lang
    """

    # stats_pruned_read: pruning is a superset guarantee, so the
    # aggregate replays over the plain filtered table
    o["stats_pruned_read"] = """
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents WHERE n_chars BETWEEN 400 AND 600 GROUP BY lang
    """

    # partitioned_read: the commits partition the same rows the plain
    # table holds, so the filtered aggregate is directly replayable
    o["partitioned_read"] = """
        SELECT source, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents WHERE lang = 'en' GROUP BY source
    """

    # sq8_ann: bounds, floor-quantize, midpoint dequant, asymmetric
    # dot — every step integer or fixed-order double arithmetic
    o["sq8_ann"] = f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v
                   FROM embeddings),
        dims AS (
          SELECT i, min(v[i]) AS lo, max(v[i]) AS hi
          FROM c, unnest(range(1, 65)) AS t(i) GROUP BY i),
        b AS (SELECT list(lo ORDER BY i) AS los,
                     list(hi ORDER BY i) AS his FROM dims),
        codes AS (
          SELECT vec_id,
                 list_transform(range(1, 65), i ->
                   CASE WHEN his[i] - los[i] > 0 THEN
                     greatest(0, least(255,
                       CAST(floor(256.0 * (v[i] - los[i])
                                  / (his[i] - los[i])) AS INT)))
                   ELSE 0 END) AS cd
          FROM c, b),
        dq AS (
          SELECT vec_id,
                 list_transform(range(1, 65), i ->
                   los[i] + (cd[i] + 0.5) * (his[i] - los[i]) / 256.0)
                   AS dv
          FROM codes, b),
        scored AS (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 round({_SQL_DOT.format(a="q.v", b="n.dv")}, 6) AS score
          FROM c q, dq n
          WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, score, rank FROM (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS INT) AS rank
          FROM scored)
        WHERE rank <= 5
    """

    # pq_ann_topk: the PQ pipeline replayed — same subspace slices,
    # same 6dp-rounded argmin code assignment, same 1e-6-quantized
    # integer ADC sums, same (adist, neighbor) rank order.
    _l2s = _SQL_L2.format(a="su.sv", b="cb.cv", n=9)
    o["pq_ann_topk"] = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        subs AS (
          SELECT vec_id, s.sub, v[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
          FROM e, (SELECT unnest(range(0, 8)) AS sub) s),
        cb AS (SELECT vec_id AS cell, sub, sv AS cv
               FROM subs WHERE vec_id < 16),
        codes AS (
          SELECT su.vec_id, su.sub, cb.cell AS code
          FROM subs su JOIN cb ON cb.sub = su.sub
          QUALIFY row_number() OVER (
            PARTITION BY su.vec_id, su.sub
            ORDER BY round({_l2s}, 6), cb.cell) = 1),
        dt AS (
          SELECT su.vec_id AS query_id, su.sub, cb.cell AS code,
                 CAST(round({_l2s} * 1000000) AS BIGINT) AS d2q
          FROM subs su JOIN cb ON cb.sub = su.sub
          WHERE su.vec_id < 10),
        adc AS (
          SELECT dt.query_id, c.vec_id AS neighbor_id,
                 ROUND(CAST(SUM(dt.d2q) AS BIGINT) / 1000000.0, 6) AS adist
          FROM codes c JOIN dt ON dt.sub = c.sub AND dt.code = c.code
          WHERE c.vec_id <> dt.query_id
          GROUP BY dt.query_id, c.vec_id)
        SELECT query_id, neighbor_id, adist, rank FROM (
          SELECT adc.*, row_number() OVER (
            PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
          FROM adc) r
        WHERE rank <= 5
    """

    # ivf_pq_ann: full composition replay — L2 coarse assignment
    # (round 6dp, cell tie-break) for corpus cells AND query probes,
    # probe-to-cell equi-join for candidates, then the pq_ann_topk
    # codes/dt/adc machinery restricted to the candidate pairs.
    _l2f = _SQL_L2.format(a="c.v", b="cents.cv", n=65)
    o["ivf_pq_ann"] = f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 16),
        cells AS (
          SELECT vec_id AS neighbor_id, cell FROM (
            SELECT c.vec_id, cents.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY round({_l2f}, 6), cents.cell) AS rn
            FROM e c CROSS JOIN cents)
          WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, cell FROM (
            SELECT c.vec_id, cents.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY round({_l2f}, 6), cents.cell) AS rn
            FROM e c CROSS JOIN cents WHERE c.vec_id < 10)
          WHERE rn <= 4),
        cands AS (
          SELECT p.query_id, n.neighbor_id
          FROM probes p JOIN cells n USING (cell)
          WHERE n.neighbor_id <> p.query_id),
        subs AS (
          SELECT vec_id, s.sub, v[s.sub * 8 + 1 : s.sub * 8 + 8] AS sv
          FROM e, (SELECT unnest(range(0, 8)) AS sub) s),
        cb AS (SELECT vec_id AS cell, sub, sv AS cv
               FROM subs WHERE vec_id < 16),
        codes AS (
          SELECT su.vec_id AS neighbor_id, su.sub, cb.cell AS code
          FROM subs su JOIN cb ON cb.sub = su.sub
          QUALIFY row_number() OVER (
            PARTITION BY su.vec_id, su.sub
            ORDER BY round({_l2s}, 6), cb.cell) = 1),
        dt AS (
          SELECT su.vec_id AS query_id, su.sub, cb.cell AS code,
                 CAST(round({_l2s} * 1000000) AS BIGINT) AS d2q
          FROM subs su JOIN cb ON cb.sub = su.sub
          WHERE su.vec_id < 10),
        adc AS (
          SELECT ca.query_id, ca.neighbor_id,
                 ROUND(CAST(SUM(dt.d2q) AS BIGINT) / 1000000.0, 6) AS adist
          FROM cands ca
          JOIN codes c USING (neighbor_id)
          JOIN dt ON dt.query_id = ca.query_id
                 AND dt.sub = c.sub AND dt.code = c.code
          GROUP BY ca.query_id, ca.neighbor_id)
        SELECT query_id, neighbor_id, adist, rank FROM (
          SELECT adc.*, row_number() OVER (
            PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
          FROM adc) r
        WHERE rank <= 5
    """

    o["embedding_neardup"] = f"""
        WITH c AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.label AS label, a.vec_id AS a, b.vec_id AS b,
               {_sql_cosine("a.v", "b.v")} AS cosine
        FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_sql_cosine("a.v", "b.v")} >= 0.25
    """

    # bitext_pairs: the margin pipeline replayed step-for-step — same
    # 6dp cosine fold, same k=4 windowed neighborhood means, same
    # rounded ratio margin, forward argmax with the tgt_id tiebreak
    o["bitext_pairs"] = f"""
        WITH s AS (SELECT vec_id AS src_id, embedding::DOUBLE[] AS v
                   FROM embeddings WHERE label < 5),
        t AS (SELECT vec_id AS tgt_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE label >= 5),
        sc AS (SELECT src_id, tgt_id,
                      {_sql_cosine("s.v", "t.v")} AS cosine FROM s, t),
        ms AS (SELECT src_id,
                      CAST(SUM(CAST(round(cosine * 1000000) AS BIGINT))
                           AS DOUBLE) / (COUNT(*) * 1000000.0) AS m FROM (
           SELECT src_id, cosine, row_number() OVER (
             PARTITION BY src_id ORDER BY cosine DESC, tgt_id) r FROM sc)
           WHERE r <= 4 GROUP BY src_id),
        mt AS (SELECT tgt_id,
                      CAST(SUM(CAST(round(cosine * 1000000) AS BIGINT))
                           AS DOUBLE) / (COUNT(*) * 1000000.0) AS m FROM (
           SELECT tgt_id, cosine, row_number() OVER (
             PARTITION BY tgt_id ORDER BY cosine DESC, src_id) r FROM sc)
           WHERE r <= 4 GROUP BY tgt_id),
        mg AS (SELECT sc.src_id, sc.tgt_id, cosine,
                      round(cosine / (ms.m / 2 + mt.m / 2), 6) AS margin
               FROM sc JOIN ms USING (src_id) JOIN mt USING (tgt_id)),
        best AS (SELECT src_id, tgt_id, cosine, margin FROM (
           SELECT *, row_number() OVER (
             PARTITION BY src_id ORDER BY margin DESC, tgt_id) r FROM mg)
           WHERE r = 1)
        SELECT src_id, tgt_id, cosine, margin
        FROM best WHERE margin >= 1.1
    """

    # dust_param_rules / dust_collapse: the miner's exact dataflow in
    # DuckDB list lambdas — witness key = md5(base || sorted other-kvs),
    # group stats = distinct pvals/digests per witness, verdict per
    # (host, param); collapse then re-applies the mined dead-param list
    # with the same order-preserving list_filter rebuild
    _dust_caps = """
        caps AS (
          SELECT 'https://h' || (doc_id % 13) || '.dust.test/item/'
                   || (doc_id % 5)
                   || '?sort=' || (doc_id % 3)
                   || '&session=s' || (doc_id % 7) AS url,
                 md5((doc_id % 13) || '-' || (doc_id % 5) || '-'
                     || (doc_id % 3)) AS digest
          FROM documents),
        parsed AS (
          SELECT url, digest,
                 lower(regexp_replace(regexp_replace(
                   split_part(split_part(url, '://', 2), '/', 1),
                   '^www\\.', ''), ':[0-9]+$', '')) AS host,
                 split_part(url, '?', 1) AS base,
                 string_split(split_part(split_part(url, '?', 2), '#', 1),
                              '&') AS kvs
          FROM caps WHERE contains(url, '?')),
        occ AS (
          SELECT url, digest, host, base, kvs,
                 unnest(list_distinct(list_transform(
                   kvs, kv -> split_part(kv, '=', 1)))) AS param
          FROM parsed),
        wit AS (
          SELECT host, param,
                 md5(base || array_to_string(list_sort(list_filter(
                   kvs, kv -> split_part(kv, '=', 1) != param)), '&'))
                   AS witness,
                 array_to_string(list_sort(list_filter(
                   kvs, kv -> split_part(kv, '=', 1) = param)), '&')
                   AS pval,
                 digest
          FROM occ),
        grp AS (
          SELECT host, param, witness,
                 COUNT(DISTINCT pval) AS n_vals,
                 COUNT(DISTINCT digest) AS n_digests
          FROM wit GROUP BY host, param, witness),
        rules AS (
          SELECT host, param,
                 CAST(SUM(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS evidence_groups,
                 CAST(SUM(CASE WHEN n_vals >= 2 AND n_digests > 1
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS violation_groups
          FROM grp GROUP BY host, param
          HAVING SUM(CASE WHEN n_vals >= 2 THEN 1 ELSE 0 END) >= 1)
    """
    o["dust_param_rules"] = f"""
        WITH {_dust_caps}
        SELECT host, param, evidence_groups, violation_groups,
               (evidence_groups >= 2 AND violation_groups = 0)
                 AS irrelevant
        FROM rules
    """
    o["dust_collapse"] = f"""
        WITH {_dust_caps},
        dead AS (
          SELECT host, list(param) AS dead_params
          FROM rules
          WHERE evidence_groups >= 2 AND violation_groups = 0
          GROUP BY host),
        stripped AS (
          SELECT p.url, p.host,
                 CASE
                   WHEN d.host IS NULL THEN p.url
                   WHEN len(list_filter(p.kvs, kv -> NOT list_contains(
                        d.dead_params, split_part(kv, '=', 1)))) = 0
                     THEN p.base
                   ELSE p.base || '?' || array_to_string(list_filter(
                        p.kvs, kv -> NOT list_contains(
                          d.dead_params, split_part(kv, '=', 1))), '&')
                 END AS url_collapsed
          FROM parsed p LEFT JOIN dead d ON p.host = d.host)
        SELECT host,
               CAST(COUNT(DISTINCT url) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT url_collapsed) AS BIGINT)
                 AS n_collapsed
        FROM stripped GROUP BY host
    """

    # aimd_rates: the controller fold replayed in list_reduce — the
    # initial rate rides as the list head (DuckDB's reduce has no init
    # slot), outcomes sort by ts inside the per-host list, and every
    # constant is an exact binary fraction so the float states agree
    # bit-for-bit with Spark's aggregate lambda
    o["aimd_rates"] = """
        WITH log AS (
          SELECT 'h' || (doc_id % 17) || '.aimd.test' AS host,
                 doc_id AS ts,
                 ((doc_id * doc_id) % 5) != 0 AS ok
          FROM documents),
        g AS (
          SELECT host,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 CAST(SUM(CASE WHEN NOT ok THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_failures,
                 list_transform(
                   list_sort(list(struct_pack(
                     ts := ts,
                     code := CASE WHEN ok THEN 1.0 ELSE 0.0 END))),
                   e -> e.code) AS codes
          FROM log GROUP BY host)
        SELECT host, n_events, n_failures,
               list_reduce(
                 list_prepend(CAST(1.0 AS DOUBLE),
                   CASE WHEN len(codes) > 512
                        THEN codes[len(codes) - 511:]
                        ELSE codes END),
                 (acc, x) -> CASE WHEN x >= 1.0
                   THEN least(acc + 0.25, 8.0)
                   ELSE greatest(acc * 0.5, 0.125) END) AS rate
        FROM g
    """

    # url_word_filter: both signals recomputed from the residues that
    # generated the URLs — seg1/seg2 carry the only weighted tokens, the
    # strict 'xxx' hit is exactly the i%11 host branch
    o["url_word_filter"] = """
        WITH d AS (
          SELECT doc_id AS i,
                 ['casino','news','poker','blog','slots'][doc_id % 5 + 1]
                   AS seg1,
                 ['free','read','daily'][doc_id % 3 + 1] AS seg2,
                 CASE WHEN doc_id % 11 = 0 THEN 'myxxxsite'
                      ELSE 'w' || (doc_id % 9) END AS hostpart
          FROM documents)
        SELECT 'https://' || hostpart || '.score.test/' || seg1 || '/'
                 || seg2 || '-' || i AS url,
               CASE seg1 WHEN 'casino' THEN 1.0 WHEN 'poker' THEN 0.5
                         WHEN 'slots' THEN 0.5 ELSE 0.0 END
                 + CASE seg2 WHEN 'free' THEN 0.25 ELSE 0.0 END
                 AS url_score,
               (i % 11 = 0) AS strict_hit,
               (i % 11 = 0) OR
               (CASE seg1 WHEN 'casino' THEN 1.0 WHEN 'poker' THEN 0.5
                          WHEN 'slots' THEN 0.5 ELSE 0.0 END
                + CASE seg2 WHEN 'free' THEN 0.25 ELSE 0.0 END) >= 1.0
                 AS blocked
        FROM d
    """

    # adaptive_frontier_pipeline: every stage rebuilt from the residues
    # that generated the evidence — the miner provably strips exactly
    # `session` (digest is session-independent, sort-dependent), so the
    # collapsed identity is (host, path, sort); 'casino' paths score 1.0
    # and die; the AIMD fold replays in list_reduce; the politeness
    # batch is row_number by url within host, clamped by the quota
    o["adaptive_frontier_pipeline"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        idents AS (
          SELECT DISTINCT (i % 7) AS h, (i % 5) AS p, (i % 3) AS s
          FROM d),
        urls AS (
          SELECT 'h' || h || '.pipe.test' AS host,
                 'https://h' || h || '.pipe.test/'
                   || ['casino','news','poker','blog','docs'][p + 1]
                   || '/' || p || '?sort=' || s AS url,
                 ['casino','news','poker','blog','docs'][p + 1] AS seg
          FROM idents),
        kept AS (SELECT host, url FROM urls WHERE seg != 'casino'),
        log AS (
          SELECT 'h' || (i % 7) || '.pipe.test' AS host, i AS ts,
                 (i % (3 + (i % 7))) != 0 AS ok
          FROM d),
        g AS (
          SELECT host,
                 list_transform(
                   list_sort(list(struct_pack(
                     ts := ts,
                     code := CASE WHEN ok THEN 1.0 ELSE 0.0 END))),
                   e -> e.code) AS codes
          FROM log GROUP BY host),
        budgets AS (
          SELECT host,
                 greatest(1, least(4, CAST(floor(
                   list_reduce(
                     list_prepend(CAST(1.0 AS DOUBLE), codes),
                     (acc, x) -> CASE WHEN x >= 1.0
                       THEN least(acc + 0.25, 8.0)
                       ELSE greatest(acc * 0.5, 0.125) END)) AS INT)))
                   AS quota
          FROM g),
        ranked AS (
          SELECT k.host, k.url, b.quota,
                 ROW_NUMBER() OVER (PARTITION BY k.host ORDER BY k.url)
                   AS host_rank
          FROM kept k LEFT JOIN budgets b USING (host))
        SELECT host, url, CAST(host_rank AS INT) AS host_rank
        FROM ranked
        WHERE host_rank <= least(coalesce(quota, 4), 4)
    """

    # seed_depth_rings: bounded recursive-CTE BFS — every path up to
    # depth 4 enumerated, min depth per node; seeds pin depth 0 via the
    # VALUES anchor; unreached nodes never appear (no infinity rows)
    o["seed_depth_rings"] = """
        WITH RECURSIVE e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents)
          WHERE src IS NOT NULL AND dst IS NOT NULL),
        walk(node, d) AS (
          SELECT * FROM (VALUES (CAST(0 AS BIGINT), 0),
                                (CAST(10 AS BIGINT), 0),
                                (CAST(20 AS BIGINT), 0)) t(node, d)
          UNION
          SELECT e.dst, w.d + 1
          FROM walk w JOIN e ON e.src = w.node
          WHERE w.d < 4)
        SELECT node, CAST(MIN(d) AS INT) AS depth
        FROM walk GROUP BY node
    """

    # softdedup_weights: exact md5 clusters over the doubled corpus,
    # weight = 1/size, token counts via the shared tokenizer SQL
    o["softdedup_weights"] = f"""
        WITH corpus AS (SELECT * FROM {_DOCS_DUP_SQL}),
        sizes AS (
          SELECT md5(text) AS fp, COUNT(*) AS cluster_size
          FROM corpus GROUP BY md5(text))
        SELECT c.doc_id,
               CAST(s.cluster_size AS BIGINT) AS cluster_size,
               ROUND(1.0 / s.cluster_size, 6) AS weight,
               CAST(len({_SQL_TOKS.format(t="c.text")}) AS BIGINT)
                 AS n_tokens,
               ROUND(ROUND(1.0 / s.cluster_size, 6)
                     * len({_SQL_TOKS.format(t="c.text")}), 6)
                 AS weighted_tokens
        FROM corpus c JOIN sizes s ON md5(c.text) = s.fp
    """

    # vocab_coverage: the frequency spectrum per language, estimators
    # recomputed from (n1, n2, N, V) with the same 6dp rounding
    o["vocab_coverage"] = f"""
        WITH freqs AS (
          SELECT lang, word, COUNT(*) AS f FROM (
            SELECT lang, unnest({toks_doc}) AS word FROM documents)
          GROUP BY lang, word),
        agg AS (
          SELECT lang,
                 CAST(SUM(f) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS vocab_size,
                 CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS singletons,
                 CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS doubletons
          FROM freqs GROUP BY lang)
        SELECT lang, n_tokens, vocab_size, singletons, doubletons,
               ROUND(CAST(singletons AS DOUBLE) / n_tokens, 6)
                 AS unseen_mass,
               ROUND(CASE WHEN doubletons > 0
                     THEN vocab_size + (singletons * singletons)
                          / (2.0 * doubletons)
                     ELSE CAST(vocab_size AS DOUBLE) END, 6)
                 AS chao1_vocab
        FROM agg
    """

    # script_profile: the same class-removal counting in RE2 syntax
    # ([\x{...}] ranges = the operator's [\u...] Java classes), dominant
    # = first script in declaration order achieving the max
    o["script_profile"] = """
        WITH d AS (
          SELECT doc_id,
                 text || CASE doc_id % 4
                   WHEN 0 THEN ' Привет мир'
                   WHEN 1 THEN ' 你好世界'
                   WHEN 2 THEN ' مرحبا'
                   ELSE '' END AS t
          FROM documents),
        c AS (
          SELECT doc_id,
                 CAST(length(t) - length(regexp_replace(t,
                   '[A-Za-z\\x{00C0}-\\x{024F}]', '', 'g')) AS BIGINT)
                   AS n_latin,
                 CAST(length(t) - length(regexp_replace(t,
                   '[\\x{0400}-\\x{04FF}]', '', 'g')) AS BIGINT)
                   AS n_cyrillic,
                 CAST(length(t) - length(regexp_replace(t,
                   '[\\x{0600}-\\x{06FF}]', '', 'g')) AS BIGINT)
                   AS n_arabic,
                 CAST(length(t) - length(regexp_replace(t,
                   '[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}'
                   || '\\x{AC00}-\\x{D7AF}]', '', 'g')) AS BIGINT)
                   AS n_cjk
          FROM d)
        SELECT doc_id, n_latin, n_cyrillic, n_arabic, n_cjk,
               CASE WHEN greatest(n_latin, n_cyrillic, n_arabic, n_cjk)
                         = 0 THEN 'none'
                    WHEN n_latin = greatest(n_latin, n_cyrillic,
                                            n_arabic, n_cjk)
                      THEN 'latin'
                    WHEN n_cyrillic = greatest(n_cyrillic, n_arabic,
                                               n_cjk) THEN 'cyrillic'
                    WHEN n_arabic = greatest(n_arabic, n_cjk)
                      THEN 'arabic'
                    ELSE 'cjk' END AS dominant
        FROM c
    """

    # revalidation_bandwidth: validator choice and the 304 expectation
    # replayed from the generating residues; bodies of 400/500 bytes sit
    # under the 600-byte overhead, exercising the not-worthwhile branch
    o["revalidation_bandwidth"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        f AS (
          SELECT i, (i % 10) / 10.0 AS p,
                 CAST(400 + (i % 50) * 100 AS DOUBLE) AS body,
                 (i % 3 = 0) AS has_etag, (i % 4 = 0) AS has_lm
          FROM d),
        pl AS (
          SELECT CASE WHEN has_etag THEN 'etag'
                      WHEN has_lm THEN 'last-modified'
                      ELSE 'none' END AS validator,
                 CASE WHEN (has_etag OR has_lm) AND body > 600
                      THEN p * body + (1 - p) * 600
                      ELSE body END AS expected,
                 body
          FROM f)
        SELECT validator,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               ROUND(SUM(ROUND(expected, 6)), 6) AS expected_total,
               ROUND(SUM(ROUND(body - expected, 6)), 6) AS saved_total
        FROM pl GROUP BY validator
    """

    # lsh_plan: the S-curve arithmetic replayed over the factorizations
    # of 128 (pow parity is the repo's established libm convention)
    o["lsh_plan"] = """
        WITH facts AS (
          SELECT CAST(b.x AS BIGINT) AS bands,
                 CAST(128 / b.x AS BIGINT) AS rows
          FROM generate_series(1, 128) b(x) WHERE 128 % b.x = 0)
        SELECT bands, rows,
               ROUND(pow(1.0 / bands, 1.0 / rows), 6) AS knee,
               ROUND(1.0 - pow(1.0 - pow(0.7, rows), bands), 6)
                 AS p_below,
               ROUND(1.0 - pow(1.0 - pow(0.8, rows), bands), 6)
                 AS p_at_threshold,
               ROUND(1.0 - pow(1.0 - pow(0.9, rows), bands), 6)
                 AS p_above
        FROM facts
    """

    # curation_attribution: the first-match CASE chain replayed over the
    # same features (token count, distinct ratio, md5 dup keeper)
    o["curation_attribution"] = f"""
        WITH corpus AS (SELECT * FROM {_DOCS_DUP_SQL}),
        feats AS (
          SELECT doc_id, md5(text) AS fp,
                 len(toks) AS nt,
                 CASE WHEN len(toks) = 0 THEN 1.0
                      ELSE len(list_distinct(toks)) * 1.0 / len(toks)
                 END AS ratio
          FROM (SELECT doc_id, text, {_SQL_TOKS.format(t="text")} AS toks
                FROM corpus)),
        winners AS (SELECT fp, MIN(doc_id) AS keeper
                    FROM feats GROUP BY fp),
        tagged AS (
          SELECT CASE WHEN nt < 30 THEN 'too_short'
                      WHEN ratio < 0.4 THEN 'too_repetitive'
                      WHEN doc_id != keeper THEN 'duplicate'
                      ELSE 'kept' END AS verdict
          FROM feats JOIN winners USING (fp)),
        counts AS (SELECT verdict, CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM tagged GROUP BY verdict),
        t AS (SELECT SUM(n_docs) AS tot FROM counts)
        SELECT verdict, n_docs,
               ROUND(CAST(n_docs AS DOUBLE) / tot, 6) AS share
        FROM counts, t
    """

    # explore_exploit: exploit pot floor(0.9*500)=450 proportional to
    # score with the 6dp-round-then-floor convention; explore pot 50
    # uniform over the 9 new hosts, remainder +1 to the md5-smallest
    o["explore_exploit"] = """
        WITH hosts AS (
          SELECT DISTINCT 'h' || (doc_id % 29) || '.ee.test' AS host,
                 CAST((doc_id % 29) + 1 AS DOUBLE) AS score,
                 (doc_id % 29) < 20 AS known
          FROM documents),
        t AS (
          SELECT SUM(CASE WHEN known THEN score ELSE 0 END) AS tscore,
                 SUM(CASE WHEN NOT known THEN 1 ELSE 0 END) AS nnew
          FROM hosts),
        bonus AS (
          SELECT host, 1 AS b FROM (
            SELECT h.host,
                   ROW_NUMBER() OVER (ORDER BY md5(h.host), h.host)
                     AS rn,
                   t.nnew
            FROM hosts h, t WHERE NOT h.known) x
          WHERE rn <= 50 % nnew)
        SELECT h.host, h.known,
               CAST(CASE WHEN h.known THEN
                      CASE WHEN t.tscore > 0 THEN
                        floor(round(450.0 * h.score / t.tscore, 6))
                      ELSE 0 END
                    ELSE floor(50.0 / t.nnew) + coalesce(b.b, 0)
               END AS BIGINT) AS quota
        FROM hosts h CROSS JOIN t LEFT JOIN bonus b ON h.host = b.host
    """

    # ngram_diversity: grams rebuilt with inclusive list slices
    # (toks[i:i+n-1] = n elements), one count/count-distinct per n
    o["ngram_diversity"] = f"""
        WITH t AS (SELECT lang, {toks_doc} AS toks FROM documents),
        g1 AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n1_total,
                 CAST(COUNT(DISTINCT g) AS BIGINT) AS n1_distinct
          FROM (SELECT lang, unnest(toks) AS g FROM t) GROUP BY lang),
        g2 AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n2_total,
                 CAST(COUNT(DISTINCT g) AS BIGINT) AS n2_distinct
          FROM (SELECT lang, unnest(list_transform(
                  range(1, len(toks)),
                  i -> array_to_string(toks[i:i+1], ' '))) AS g
                FROM t) GROUP BY lang),
        g3 AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n3_total,
                 CAST(COUNT(DISTINCT g) AS BIGINT) AS n3_distinct
          FROM (SELECT lang, unnest(list_transform(
                  range(1, len(toks) - 1),
                  i -> array_to_string(toks[i:i+2], ' '))) AS g
                FROM t) GROUP BY lang)
        SELECT lang,
               n1_total, n1_distinct,
               ROUND(CAST(n1_distinct AS DOUBLE) / n1_total, 6)
                 AS distinct_1,
               n2_total, n2_distinct,
               ROUND(CAST(n2_distinct AS DOUBLE) / n2_total, 6)
                 AS distinct_2,
               n3_total, n3_distinct,
               ROUND(CAST(n3_distinct AS DOUBLE) / n3_total, 6)
                 AS distinct_3
        FROM g1 JOIN g2 USING (lang) JOIN g3 USING (lang)
    """

    # zipf_slope: the quantized OLS replayed — same top-k cut, same
    # floor(ln * 1e6) points, exact integer sums, same expression
    # parenthesization so the final doubles agree bit-for-bit
    o["zipf_slope"] = f"""
        WITH freqs AS (
          SELECT term, count(*) AS freq FROM (
            SELECT unnest({toks_doc}) AS term FROM documents)
          GROUP BY term ORDER BY freq DESC, term LIMIT 2000),
        ranked AS (
          SELECT row_number() OVER (ORDER BY freq DESC, term) AS rank,
                 freq
          FROM freqs),
        pts AS (
          SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0)
                      AS BIGINT) AS x,
                 CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000.0)
                      AS BIGINT) AS y
          FROM ranked),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM pts)
        SELECT n AS n_points,
               ROUND((CAST(n AS DOUBLE) * (sxy / 1000000000000.0)
                      - (sx / 1000000.0) * (sy / 1000000.0))
                     / (CAST(n AS DOUBLE) * (sxx / 1000000000000.0)
                        - (sx / 1000000.0) * (sx / 1000000.0)), 6)
                 AS slope,
               ROUND(((sy / 1000000.0)
                      - ((CAST(n AS DOUBLE) * (sxy / 1000000000000.0)
                          - (sx / 1000000.0) * (sy / 1000000.0))
                         / (CAST(n AS DOUBLE) * (sxx / 1000000000000.0)
                            - (sx / 1000000.0) * (sx / 1000000.0)))
                        * (sx / 1000000.0)) / CAST(n AS DOUBLE), 6)
                 AS intercept,
               ROUND(((CAST(n AS DOUBLE) * (sxy / 1000000000000.0)
                       - (sx / 1000000.0) * (sy / 1000000.0))
                      * (CAST(n AS DOUBLE) * (sxy / 1000000000000.0)
                         - (sx / 1000000.0) * (sy / 1000000.0)))
                     / ((CAST(n AS DOUBLE) * (sxx / 1000000000000.0)
                         - (sx / 1000000.0) * (sx / 1000000.0))
                        * (CAST(n AS DOUBLE) * (syy / 1000000000000.0)
                           - (sy / 1000000.0) * (sy / 1000000.0))), 6)
                 AS r2
        FROM s
    """

    # snapshot_term_drift: add-one smoothing over the union vocab,
    # per-term deltas rounded 9dp, cut by (|delta| desc, term)
    o["snapshot_term_drift"] = f"""
        WITH a AS (
          SELECT text FROM documents WHERE doc_id % 2 = 0),
        b AS (
          SELECT CASE WHEN doc_id % 5 = 0
                 THEN text || ' breaking election results'
                 ELSE text END AS text
          FROM documents WHERE doc_id % 2 = 1),
        ca AS (
          SELECT term, count(*) AS n_a FROM (
            SELECT unnest({_SQL_TOKS.format(t="text")}) AS term FROM a)
          GROUP BY term),
        cb AS (
          SELECT term, count(*) AS n_b FROM (
            SELECT unnest({_SQL_TOKS.format(t="text")}) AS term FROM b)
          GROUP BY term),
        m AS (
          SELECT coalesce(ca.term, cb.term) AS term,
                 coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
          FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
        t AS (
          SELECT CAST(SUM(n_a) AS DOUBLE) AS ta,
                 CAST(SUM(n_b) AS DOUBLE) AS tb,
                 CAST(COUNT(*) AS DOUBLE) AS v
          FROM m)
        SELECT term, n_a, n_b,
               ROUND((n_a + 1.0) / (ta + v), 9) AS p_a,
               ROUND((n_b + 1.0) / (tb + v), 9) AS p_b,
               ROUND((n_b + 1.0) / (tb + v)
                     - (n_a + 1.0) / (ta + v), 9) AS delta,
               ROUND(ln(((n_b + 1.0) / (tb + v))
                        / ((n_a + 1.0) / (ta + v))), 6) AS log_odds
        FROM m, t
        ORDER BY abs(ROUND((n_b + 1.0) / (tb + v)
                           - (n_a + 1.0) / (ta + v), 9)) DESC, term
        LIMIT 20
    """

    # retrieval_metrics: the TREC arithmetic replayed — gains 2^rel - 1,
    # log2(rank+1) discounts, ideal ranking by (rel desc, doc) with
    # row_number positions, zero rows for judged-but-unsearched queries
    o["retrieval_metrics"] = """
        WITH docs100 AS (
          SELECT DISTINCT doc_id % 100 AS doc FROM documents),
        qspan AS (SELECT x AS qid FROM generate_series(0, 4) t(x)),
        results AS (
          SELECT 'q' || qid AS query_id,
                 (qid * 13 + r.x * 7) % 100 AS doc_id,
                 CAST(r.x AS INT) AS rank
          FROM qspan, generate_series(1, 10) r(x)),
        qrels AS (
          SELECT 'q' || qid AS query_id, doc AS doc_id,
                 CAST(doc % 3 AS INT) AS rel
          FROM qspan, docs100 WHERE (doc + qid) % 4 = 0),
        joined AS (
          SELECT r.query_id, r.rank,
                 COALESCE(CAST(j.rel AS DOUBLE), 0.0) AS rel
          FROM results r LEFT JOIN qrels j
            ON r.query_id = j.query_id AND r.doc_id = j.doc_id),
        got AS (
          SELECT query_id,
                 MAX(CASE WHEN rel > 0 THEN 1.0 / rank ELSE 0.0 END)
                   AS mrr,
                 SUM(CASE WHEN rank <= 10 AND rel > 0 THEN 1 ELSE 0 END)
                   AS hits_k,
                 SUM(CASE WHEN rank <= 10
                     THEN (pow(2.0, rel) - 1.0) / log2(rank + 1.0)
                     ELSE 0.0 END) AS dcg_k
          FROM joined GROUP BY query_id),
        nrel AS (
          SELECT query_id, COUNT(*) AS n_rel
          FROM qrels WHERE rel > 0 GROUP BY query_id),
        ideal AS (
          SELECT t.query_id, nrel.n_rel,
                 SUM((pow(2.0, t.rel) - 1.0) / log2(t.rn + 1.0))
                   AS idcg_k
          FROM (
            SELECT query_id, CAST(rel AS DOUBLE) AS rel,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY rel DESC) AS rn
            FROM qrels WHERE rel > 0) t
          JOIN nrel USING (query_id)
          WHERE t.rn <= 10 GROUP BY t.query_id, nrel.n_rel)
        SELECT i.query_id,
               ROUND(COALESCE(g.mrr, 0.0), 6) AS mrr,
               ROUND(COALESCE(g.hits_k, 0) / 10.0, 6) AS precision_k,
               ROUND(COALESCE(g.hits_k, 0) / CAST(i.n_rel AS DOUBLE), 6)
                 AS recall_k,
               ROUND(CASE WHEN i.idcg_k > 0
                     THEN COALESCE(g.dcg_k, 0.0) / i.idcg_k
                     ELSE 0.0 END, 6) AS ndcg_k
        FROM ideal i LEFT JOIN got g USING (query_id)
    """

    # embedding_outliers: the quantized-integer pipeline replayed —
    # component -> floor(val * 2^20) long (exact multiply, tie-free
    # floor), centroid = floor(int-sum / n) as long, d2 = exact integer
    # sum of squared diffs, rank by (d2 desc, id)
    o["embedding_outliers"] = """
        WITH q AS (
          SELECT vec_id, pos,
                 CAST(floor(CAST(val AS DOUBLE) * 1048576.0) AS BIGINT)
                   AS qv
          FROM (
            SELECT vec_id, unnest(embedding) AS val,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings)),
        c AS (
          SELECT pos,
                 CAST(floor(CAST(SUM(qv) AS DOUBLE) / COUNT(*)) AS BIGINT)
                   AS cq
          FROM q GROUP BY pos),
        d AS (
          SELECT vec_id,
                 CAST(SUM((qv - cq) * (qv - cq)) AS BIGINT) AS d2
          FROM q JOIN c USING (pos) GROUP BY vec_id)
        SELECT vec_id, d2,
               CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT)
                 AS dist_micros
        FROM d ORDER BY d2 DESC, vec_id LIMIT 25
    """

    # host_shard_ring: the ring rebuilt position-for-position (md5-u32
    # twin expression), owner = first clockwise (pos >= hpos) by
    # (pos, shard), wrap = global min when no position is clockwise
    o["host_shard_ring"] = """
        WITH ring AS (
          SELECT CAST(s.x AS BIGINT) AS shard,
                 ('0x' || substring(md5('ring-' || s.x || '-' || v.x),
                                    1, 8))::BIGINT AS pos
          FROM generate_series(0, 7) s(x), generate_series(0, 31) v(x)),
        h AS (
          SELECT DISTINCT 'h' || (doc_id % 251) || '.shard.test' AS host
          FROM documents),
        hp AS (
          SELECT host,
                 ('0x' || substring(md5(host), 1, 8))::BIGINT AS hpos
          FROM h)
        SELECT host, shard FROM (
          SELECT hp.host, ring.shard,
                 ROW_NUMBER() OVER (
                   PARTITION BY hp.host
                   ORDER BY (ring.pos < hp.hpos), ring.pos, ring.shard)
                   AS rn
          FROM hp, ring) t
        WHERE rn = 1
    """

    # fetch_timetable: the aimd fold (same list_reduce replay) feeding
    # the per-host dispatch window — fetch_at = host_seq / rate
    o["fetch_timetable"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        log AS (
          SELECT 'h' || (i % 17) || '.aimd.test' AS host, i AS ts,
                 ((i * i) % 5) != 0 AS ok
          FROM d),
        g AS (
          SELECT host,
                 list_transform(
                   list_sort(list(struct_pack(
                     ts := ts,
                     code := CASE WHEN ok THEN 1.0 ELSE 0.0 END))),
                   e -> e.code) AS codes
          FROM log GROUP BY host),
        rates AS (
          SELECT host,
                 list_reduce(
                   list_prepend(CAST(1.0 AS DOUBLE), codes),
                   (acc, x) -> CASE WHEN x >= 1.0
                     THEN least(acc + 0.25, 8.0)
                     ELSE greatest(acc * 0.5, 0.125) END) AS rate
          FROM g),
        batch AS (
          SELECT 'h' || (i % 17) || '.aimd.test' AS host,
                 'https://h' || (i % 17) || '.aimd.test/' || i AS url
          FROM d WHERE i % 5 = 0)
        SELECT b.host, b.url,
               CAST(ROW_NUMBER() OVER (PARTITION BY b.host ORDER BY b.url)
                    - 1 AS INT) AS host_seq,
               ROUND((ROW_NUMBER() OVER (PARTITION BY b.host
                                         ORDER BY b.url) - 1)
                     / coalesce(r.rate, 1.0), 6) AS fetch_at
        FROM batch b LEFT JOIN rates r USING (host)
    """

    # focused_frontier: the shark-search arithmetic replayed — anchor
    # score by the known 3-way rotation (2/2, 1/2, 0/2 query terms),
    # potential composed in the operator's exact order, per-child argmax
    # via QUALIFY (potential desc, parent asc = the min-parent tie)
    o["focused_frontier"] = """
        WITH d AS (SELECT doc_id AS i FROM documents),
        pages AS (
          SELECT 'https://f' || (i % 11) || '.foc.test/p/' || i AS purl,
                 ((i * 7) % 10) / 10.0 AS rel
          FROM d WHERE i % 4 != 3),
        links AS (
          SELECT 'https://f' || (i % 11) || '.foc.test/p/' || i AS purl,
                 'https://c' || ((i * 3 + 1) % 11) || '.foc.test/c/'
                   || ((i * i) % 37) AS url,
                 CASE i % 3 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                            ELSE 0.0 END AS anchor
          FROM d),
        scored AS (
          SELECT l.url, l.purl,
                 0.5 * p.rel AS inherited,
                 0.8 * l.anchor + 0.2 * p.rel AS neighborhood,
                 0.5 * (0.5 * p.rel)
                   + 0.5 * (0.8 * l.anchor + 0.2 * p.rel) AS potential
          FROM links l JOIN pages p USING (purl))
        SELECT url, ROUND(potential, 6) AS potential,
               ROUND(inherited, 6) AS inherited,
               ROUND(neighborhood, 6) AS neighborhood,
               purl AS best_parent
        FROM scored
        QUALIFY row_number()
          OVER (PARTITION BY url ORDER BY potential DESC, purl) = 1
    """

    # alias_collapse: every url's identity from first principles — an
    # odd id resolves to its even twin, and the even page's canonical
    # is /c/(even_id % 13); so identity = /c/((id - id%2) % 13)
    o["alias_collapse"] = """
        WITH al AS (
          SELECT 'https://ac.test/a/' || CAST(doc_id AS VARCHAR) AS url,
                 'https://ac.test/c/'
                   || CAST((doc_id - doc_id % 2) % 13 AS VARCHAR)
                   AS identity
          FROM documents)
        SELECT identity, COUNT(*) AS n_aliases, MIN(url) AS first_url
        FROM al GROUP BY identity
    """

    o["media_meta"] = """
        SELECT doc_id, octet_length(encode(text)) AS n_bytes,
               lower(substring(hex(encode(text)), 1, 8)) AS magic_hex
        FROM documents
    """

    # _fake_decode: features from md5(payload) bytes 0..3 — byte k of the
    # digest is hex pair k, so DuckDB mirrors it exactly
    def _md5_byte(k: int) -> str:
        # DuckDB md5 takes VARCHAR; hashing the utf-8 string == hashing
        # encode(text) bytes, which is what _fake_decode sees
        return f"('0x' || substring(md5(text), {2 * k + 1}, 2))::INTEGER"

    o["media_decode"] = f"""
        SELECT doc_id,
               CAST(64 + {_md5_byte(0)} % 192 AS INTEGER) AS width,
               CAST(64 + {_md5_byte(1)} % 192 AS INTEGER) AS height,
               CAST(1 + {_md5_byte(2)} % 32 AS INTEGER) AS n_frames,
               round(({_md5_byte(3)} % 300) / 10.0, 1) AS duration_s
        FROM documents
    """

    # media_ahash_neardup: identical aHash math — stride-sample 32 bytes
    # via hex-pair extraction (DuckDB hex() is uppercase like Spark's,
    # '0x'||pair cast replays conv(,16,10)), strict-greater-than-mean
    # threshold as exact integer compare (x*32 > sum), then brute-force
    # all-pairs Hamming (the pigeonhole join is an optimization, not a
    # semantic — at sf0.01's 500 docs the n^2 oracle is fine)
    o["media_ahash_neardup"] = """
        WITH m AS (
          SELECT doc_id, hex(encode(text)) AS hx,
                 octet_length(encode(text)) AS n
          FROM documents
          WHERE octet_length(encode(text)) > 0
        ),
        vals AS (
          SELECT doc_id,
                 list_transform(range(0, 32), i ->
                   ('0x' || substring(hx, CAST((i*n)//32 AS INT)*2 + 1, 2))
                   ::BIGINT) AS v
          FROM m
        ),
        bits AS (
          SELECT doc_id,
                 list_transform(v, x ->
                   CASE WHEN x*32 > list_sum(v) THEN 1 ELSE 0 END) AS b
          FROM vals
        ),
        pairs AS (
          SELECT x.doc_id AS a, y.doc_id AS b,
                 CAST(list_sum(list_transform(range(1, 33), i ->
                   CASE WHEN x.b[i] <> y.b[i] THEN 1 ELSE 0 END)) AS INT)
                   AS hamming
          FROM bits x JOIN bits y ON x.doc_id < y.doc_id
        )
        SELECT a, b, hamming FROM pairs WHERE hamming <= 3
    """

    # hll_host_cardinality: at sf0.01 every per-source cardinality sits
    # in the HLL sketch's exact (coupon) regime, so the estimate equals
    # count(DISTINCT) exactly and deterministically — the oracle states
    # the semantic (distinct count), not the sketch internals; the
    # estimation-regime tolerance is pinned in tests/test_sketches.py
    o["hll_host_cardinality"] = """
        SELECT source,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS distinct_est,
               count(*) AS n_rows
        FROM documents GROUP BY source
    """

    # LSH ANN: hyperplanes are md5-derived, embedded as double literals
    # generated by the SAME python function the Spark plan folds in
    from commoncrawl_spark.operators.similarity import hyperplane

    planes = [hyperplane(64, i) for i in range(6)]

    def _sql_dot_lit(vec: str, plane: list[float]) -> str:
        arr = "[" + ", ".join(repr(v) for v in plane) + "]"
        return (f"list_reduce(list_transform(range(1, 65), "
                f"i -> {vec}[i] * ({arr}::DOUBLE[])[i]), (x, y) -> x + y)")

    sig_terms = " + ".join(
        f"(CASE WHEN {_sql_dot_lit('v', p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    o["ann_lsh_topk"] = f"""
        WITH c AS (
          SELECT vec_id, v, {sig_terms} AS bucket
          FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 {_sql_cosine("q.v", "n.v")} AS cosine,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_sql_cosine("q.v", "n.v")} DESC, n.vec_id) AS rank
          FROM c q JOIN c n ON q.bucket = n.bucket AND n.vec_id <> q.vec_id
          WHERE q.vec_id < 10)
        WHERE rank <= 5
    """

    # hard_negatives: the LSH bucket join replayed with the band filter
    # on the same 6dp-rounded cosine, rank over the band survivors only
    o["hard_negatives"] = f"""
        WITH c AS (
          SELECT vec_id, v, {sig_terms} AS bucket
          FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
        band AS (
          SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                 {_sql_cosine("q.v", "n.v")} AS cosine
          FROM c q JOIN c n ON q.bucket = n.bucket AND n.vec_id <> q.vec_id
          WHERE q.vec_id < 10
            AND {_sql_cosine("q.v", "n.v")} >= 0.1
            AND {_sql_cosine("q.v", "n.v")} < 0.35)
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
          FROM band)
        WHERE rank <= 5
    """

    # diversity_sample: the ann_ivf_topk cells CTE (same argmax order:
    # cosine DESC, cell asc) + the stratified_sample quota/rank tail on
    # the cell key
    o["diversity_sample"] = f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents AS (SELECT vec_id AS cell, v AS cv FROM c WHERE vec_id < 16),
        cells AS (
          SELECT vec_id, cell FROM (
            SELECT c.vec_id, cents.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "cents.cv")} DESC,
                              cents.cell) AS rn
            FROM c CROSS JOIN cents)
          WHERE rn = 1),
        sizes AS (SELECT cell, COUNT(*) AS sz FROM cells GROUP BY cell),
        tot AS (SELECT SUM(sqrt(sz)) AS s FROM sizes),
        quota AS (
          SELECT cell,
                 GREATEST(1, CAST(FLOOR(ROUND(
                   100.0 * sqrt(sz) / t.s, 6)) AS BIGINT)) AS q
          FROM sizes, tot t),
        ranked AS (
          SELECT vec_id, cell,
                 ROW_NUMBER() OVER (
                   PARTITION BY cell
                   ORDER BY md5('42' || chr(31) || CAST(vec_id AS VARCHAR)),
                            vec_id) AS rk
          FROM cells)
        SELECT r.vec_id, r.cell
        FROM ranked r JOIN quota USING (cell)
        WHERE r.rk <= quota.q
    """

    o["ann_ivf_topk"] = f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents AS (SELECT vec_id AS cell, v AS cv FROM c WHERE vec_id < 16),
        cells AS (
          SELECT vec_id, v, cell FROM (
            SELECT c.vec_id, c.v, cents.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "cents.cv")} DESC, cents.cell
                   ) AS rn
            FROM c CROSS JOIN cents)
          WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, v AS qv, cell FROM (
            SELECT c.vec_id, c.v, cents.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "cents.cv")} DESC, cents.cell
                   ) AS rn
            FROM c CROSS JOIN cents WHERE c.vec_id < 10)
          WHERE rn <= 4)
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT p.query_id, n.vec_id AS neighbor_id,
                 {_sql_cosine("p.qv", "n.v")} AS cosine,
                 row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY {_sql_cosine("p.qv", "n.v")} DESC, n.vec_id) AS rank
          FROM probes p JOIN cells n ON p.cell = n.cell
          WHERE n.vec_id <> p.query_id)
        WHERE rank <= 5
    """

    # ann_ivf_kmeans_topk: full replay of the deterministic k-means
    # training (3 unrolled Lloyd iterations) + the trained-IVF probe
    o["ann_ivf_kmeans_topk"] = _sql_kmeans_ivf(
        k=16, n_iters=3, n_probe=4, topn=5, n_q=10)

    # ann_recall: the exact and IVF oracle bodies as CTEs, overlap
    # counted per query
    o["ann_recall"] = f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        exact AS (
          SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY {_sql_cosine("q.v", "n.v")} DESC, n.vec_id)
                     AS rank
            FROM c q, c n WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id)
          WHERE rank <= 5),
        cents AS (SELECT vec_id AS cell, v AS cv FROM c WHERE vec_id < 16),
        cells AS (
          SELECT vec_id, v, cell FROM (
            SELECT c.vec_id, c.v, cents.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "cents.cv")} DESC, cents.cell
                   ) AS rn
            FROM c CROSS JOIN cents)
          WHERE rn = 1),
        probes AS (
          SELECT vec_id AS query_id, v AS qv, cell FROM (
            SELECT c.vec_id, c.v, cents.cell,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "cents.cv")} DESC, cents.cell
                   ) AS rn
            FROM c CROSS JOIN cents WHERE c.vec_id < 10)
          WHERE rn <= 4),
        approx AS (
          SELECT query_id, neighbor_id FROM (
            SELECT p.query_id, n.vec_id AS neighbor_id,
                   row_number() OVER (
                     PARTITION BY p.query_id
                     ORDER BY {_sql_cosine("p.qv", "n.v")} DESC, n.vec_id)
                     AS rank
            FROM probes p JOIN cells n ON p.cell = n.cell
            WHERE n.vec_id <> p.query_id)
          WHERE rank <= 5),
        h AS (
          SELECT a.query_id, count(*) AS n_hits
          FROM approx a JOIN exact e
            ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
          GROUP BY a.query_id)
        SELECT q.vec_id AS query_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               round(coalesce(h.n_hits, 0) / 5.0, 6) AS recall_at_5
        FROM (SELECT vec_id FROM c WHERE vec_id < 10) q
        LEFT JOIN h ON h.query_id = q.vec_id
    """

    # semdedup: replay the cell assignment (same CTE as ann_ivf_topk),
    # the within-cell pair threshold, the connected duplicate groups
    # (recursive CTE, as dedup_clusters), and the farthest-from-centroid
    # election (min cent_cos, ties smallest id)
    o["semdedup"] = f"""
        WITH RECURSIVE c AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents AS (SELECT vec_id AS cell, v AS cv FROM c WHERE vec_id < 16),
        cells AS (
          SELECT vec_id, v, cell, cent_cos FROM (
            SELECT c.vec_id, c.v, cents.cell,
                   {_sql_cosine("c.v", "cents.cv")} AS cent_cos,
                   row_number() OVER (
                     PARTITION BY c.vec_id
                     ORDER BY {_sql_cosine("c.v", "cents.cv")} DESC, cents.cell
                   ) AS rn
            FROM c CROSS JOIN cents)
          WHERE rn = 1),
        pairs AS (
          SELECT a.vec_id AS a, b.vec_id AS b
          FROM cells a JOIN cells b
            ON a.cell = b.cell AND a.vec_id < b.vec_id
          WHERE {_sql_cosine("a.v", "b.v")} >= 0.3),
        e AS (SELECT a AS id, b AS nb FROM pairs
              UNION SELECT b, a FROM pairs),
        reach(id, lbl) AS (
          SELECT id, id FROM (SELECT DISTINCT id FROM e)
          UNION
          SELECT e.id, r.lbl FROM e JOIN reach r ON r.id = e.nb),
        lab AS (SELECT id, MIN(lbl) AS sem_cluster FROM reach GROUP BY id),
        ranked AS (
          SELECT cl.vec_id, cl.cell, cl.cent_cos, l.sem_cluster,
                 row_number() OVER (
                   PARTITION BY l.sem_cluster
                   ORDER BY cl.cent_cos ASC, cl.vec_id ASC) AS rn
          FROM cells cl LEFT JOIN lab l ON l.id = cl.vec_id)
        SELECT vec_id, cell, cent_cos, sem_cluster,
               (sem_cluster IS NULL OR rn = 1) AS keep
        FROM ranked
    """

    # text_normalize: the same regexp_replace chain, generated from
    # NORMALIZE_PASSES so both engines run byte-identical patterns
    # (RE2 and Java regex agree on \x{...} classes — parity-tested)
    o["text_normalize"] = f"""
        SELECT doc_id,
               length(mtext) AS n_before,
               {_sql_normalize("mtext")} AS norm,
               length({_sql_normalize("mtext")}) AS n_after
        FROM (SELECT doc_id, text || ' ' || {_MESSY_JUNK_SQL} AS mtext
              FROM documents)
    """

    # nfc_normalize: DuckDB's nfc_normalize() IS Unicode NFC, same as
    # the pandas UDF's unicodedata.normalize('NFC', ...) — parity
    # verified on combining marks and singleton compositions; the
    # regexp chain on top is the shared _sql_normalize generator
    o["nfc_normalize"] = f"""
        SELECT doc_id,
               {_sql_normalize("nfc_normalize(mtext)")} AS norm,
               length({_sql_normalize("nfc_normalize(mtext)")}) AS n_chars
        FROM (SELECT doc_id, text || ' ' || {_NFC_JUNK_SQL} AS mtext
              FROM documents)
    """

    # c4_clean: the exact C4 rules replayed as list lambdas — same
    # split/trim/filter order, same regexes (ASCII fixture keeps Java
    # and RE2 \s/\b in agreement), sentence count via the length-diff
    # identity for the single-char class [.!?]
    _c4_keep_l = (
        "regexp_matches(l, '[.!?\"]$') "
        "AND len(list_filter(regexp_split_to_array(l, '\\s+'), "
        "w -> w <> '')) >= 3 "
        "AND NOT regexp_matches(lower(l), '\\bjavascript\\b')"
    )
    o["c4_clean"] = f"""
        WITH base AS (
          SELECT doc_id,
                 text || '.' || {_sql_estr(_C4_LINE_JUNK)} ||
                 CASE WHEN doc_id % 5 = 0 THEN {_sql_estr(_C4_VARIANTS[0])}
                      WHEN doc_id % 5 = 1 THEN {_sql_estr(_C4_VARIANTS[1])}
                      WHEN doc_id % 5 = 2 THEN {_sql_estr(_C4_VARIANTS[2])}
                      WHEN doc_id % 5 = 3 THEN {_sql_estr(_C4_VARIANTS[3])}
                      ELSE '' END AS page
          FROM documents),
        lined AS (
          SELECT doc_id, page,
                 list_filter(list_transform(string_split(page, chr(10)),
                                            l -> trim(l)),
                             l -> l <> '') AS lines_all
          FROM base),
        keptt AS (
          SELECT doc_id, page, lines_all,
                 list_filter(lines_all, l -> {_c4_keep_l}) AS kept
          FROM lined),
        sig AS (
          SELECT doc_id, lines_all, kept,
                 array_to_string(kept, chr(10)) AS clean_text,
                 len(list_intersect(
                     list_filter(regexp_split_to_array(lower(page),
                                                       '\\s+'),
                                 w -> w <> ''),
                     ['badword1', 'badword2'])) > 0 AS has_bad,
                 contains(lower(page), 'lorem ipsum') AS has_lorem,
                 contains(page, '{{') AS has_brace
          FROM keptt),
        cnt AS (
          SELECT *, CAST(length(clean_text)
                         - length(regexp_replace(clean_text, '[.!?]',
                                                 '', 'g'))
                         AS BIGINT) AS n_sentences
          FROM sig)
        SELECT doc_id,
               CAST(len(lines_all) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept_lines,
               n_sentences, clean_text,
               CASE WHEN has_bad THEN 'bad_word'
                    WHEN has_lorem THEN 'lorem_ipsum'
                    WHEN has_brace THEN 'curly_brace'
                    WHEN n_sentences < 5 THEN 'too_few_sentences'
                    ELSE 'kept' END = 'kept' AS keep,
               CASE WHEN has_bad THEN 'bad_word'
                    WHEN has_lorem THEN 'lorem_ipsum'
                    WHEN has_brace THEN 'curly_brace'
                    WHEN n_sentences < 5 THEN 'too_few_sentences'
                    ELSE 'kept' END AS drop_reason
        FROM cnt
    """

    # heavy_hitters: the sketch is candidate GENERATION only — the
    # final gate is an exact integer comparison, so the oracle is the
    # plain exact count with the same cnt*k >= n predicate
    o["heavy_hitters"] = f"""
        WITH toks AS (
          SELECT unnest({_SQL_TOKS.format(
              t="text || ' tail' || CAST(doc_id % 97 AS VARCHAR)")})
                 AS token
          FROM documents),
        tot AS (SELECT count(*) AS n FROM toks),
        cnt AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
        SELECT token, cnt, round(cnt / n, 6) AS share
        FROM cnt, tot
        WHERE cnt * 100 >= n
        ORDER BY cnt DESC, token
    """

    # publication_dates: the SAME precedence table (imported, so the
    # two sides cannot drift) — per-source regexp_extract candidates,
    # try_cast calendar validation + year plausibility, first valid
    # wins via COALESCE order
    from commoncrawl_spark.functions.extract import (
        PUB_DATE_MAX_YEAR,
        PUB_DATE_MIN_YEAR,
        PUB_DATE_SOURCES,
    )

    _pd_t = ", ".join(
        "try_cast(substring(replace(regexp_extract("
        f"{where}, '{pat}', 1), '/', '-'), 1, 10) AS DATE) AS t{i}"
        for i, (_lbl, where, pat) in enumerate(PUB_DATE_SOURCES))
    _pd_v = ", ".join(
        f"CASE WHEN t{i} IS NOT NULL AND year(t{i}) BETWEEN "
        f"{PUB_DATE_MIN_YEAR} AND {PUB_DATE_MAX_YEAR} "
        f"THEN CAST(t{i} AS VARCHAR) END AS v{i}"
        for i in range(len(PUB_DATE_SOURCES)))
    _pd_src = " ".join(
        f"WHEN v{i} IS NOT NULL THEN '{lbl}'"
        for i, (lbl, _w, _p) in enumerate(PUB_DATE_SOURCES))
    o["publication_dates"] = ("""
        WITH b AS (
          SELECT doc_id, text, source,
                 lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd,
                 lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
                 doc_id % 7 AS m7
          FROM documents),
        page AS (
          SELECT doc_id,
            '<html><head>'
            || CASE WHEN m7 = 0 THEN '<meta property="article:published_time" content="2021-' || mm || '-' || dd || 'T12:30:00+00:00">' ELSE '' END
            || CASE WHEN m7 = 1 THEN '<meta name="date" content="2020-' || mm || '-' || dd || '">' ELSE '' END
            || CASE WHEN m7 = 5 THEN '<meta property="article:published_time" content="2021-02-31T00:00:00Z">' ELSE '' END
            || CASE WHEN m7 = 6 THEN '<meta property="article:published_time" content="9999-12-31T00:00:00Z">' ELSE '' END
            || '</head><body>'
            || CASE WHEN m7 = 2 THEN '<time datetime="2022-' || mm || '-' || dd || 'T08:00:00">March</time>' ELSE '' END
            || CASE WHEN m7 = 3 THEN '<script>{"datePublished": "2023-' || mm || '-' || dd || '"}</script>' ELSE '' END
            || text
            || CASE WHEN m7 = 5 THEN ' updated 2019-' || mm || '-07 by staff.' ELSE '' END
            || '</body></html>' AS html,
            'https://' || source || '.org/'
            || CASE WHEN m7 = 4 THEN '2020/' || mm || '/' || dd || '/' ELSE '' END
            || CASE WHEN m7 = 5 THEN '2019/' || mm || '/07/' ELSE '' END
            || 'post-' || CAST(doc_id AS VARCHAR) AS url
          FROM b),
        cand AS (SELECT doc_id, """ + _pd_t + """ FROM page),
        val AS (SELECT doc_id, """ + _pd_v + """ FROM cand)
        SELECT doc_id,
               COALESCE(v0, v1, v2, v3, v4, v5) AS pub_date,
               CASE """ + _pd_src + """ ELSE 'none' END AS date_source
        FROM val
    """)

    # feed_entries: same block regexes + child extraction + month map
    # (generated from FEED_MONTHS so the dialect tables cannot drift)
    from commoncrawl_spark.operators.links import FEED_MONTHS

    _fm_arr = ", ".join(f"'{m}'" for m in FEED_MONTHS)
    _fm_case = ("CASE " + " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in FEED_MONTHS.items()) + " END")
    _rfc = (r"(\d{1,2}) (Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
            r" (\d{4})")

    def _fchild(tag: str) -> str:
        return ("nullif(trim(regexp_extract(b, "
                f"'(?is)<{tag}[^>]*>\\s*([^<]*?)\\s*</{tag}>', 1)), '')")

    o["feed_entries"] = f"""
        WITH base AS (
          SELECT doc_id, source,
                 CAST(doc_id AS VARCHAR) AS sid,
                 CAST(doc_id % 28 + 1 AS VARCHAR) AS day,
                 lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS dd,
                 ([{_fm_arr}])[CAST(doc_id % 12 AS INT) + 1] AS mon,
                 lpad(CAST(doc_id % 12 + 1 AS VARCHAR), 2, '0') AS mm,
                 'https://' || source || '.org' AS host
          FROM documents),
        feeds AS (
          SELECT host || '/feed/' || sid AS feed_url,
            CASE WHEN doc_id % 2 = 0 THEN
              '<rss version="2.0"><channel><title>S</title><item><title>Post '
              || sid || '</title><link>' || host || '/a/' || sid
              || '</link><guid>g-' || sid || '</guid><pubDate>Tue, ' || day
              || ' ' || mon || ' 2021 10:00:00 GMT</pubDate></item>'
              || '<item><title>Second</title><link>' || host || '/b/' || sid
              || '</link></item><item><title>no link</title></item>'
              || '</channel></rss>'
            ELSE
              '<feed><title>S</title><entry><title>Entry ' || sid
              || '</title><link rel="alternate" href="' || host || '/x/'
              || sid || '"/><id>urn:' || sid || '</id><published>2022-'
              || mm || '-' || dd || 'T08:00:00Z</published></entry>'
              || '<entry><title>Beta</title><link href="' || host || '/y/'
              || sid
              || '"/><updated>2023-01-15T00:00:00Z</updated></entry></feed>'
            END AS xml
          FROM base),
        blocks AS (
          SELECT feed_url,
                 CASE WHEN regexp_matches(xml, '(?is)<feed[\\s>]')
                      THEN 'atom'
                      WHEN regexp_matches(xml, '(?is)<rss[\\s>]')
                      THEN 'rss' END AS kind,
                 unnest(CASE WHEN regexp_matches(xml, '(?is)<feed[\\s>]')
                   THEN regexp_extract_all(
                        xml, '(?is)<entry>(.*?)</entry>', 1)
                   ELSE regexp_extract_all(
                        xml, '(?is)<item>(.*?)</item>', 1) END) AS b
          FROM feeds
          WHERE regexp_matches(xml, '(?is)<feed[\\s>]')
             OR regexp_matches(xml, '(?is)<rss[\\s>]')),
        fields AS (
          SELECT feed_url, kind,
                 {_fchild("title")} AS title,
                 CASE WHEN kind = 'atom'
                      THEN nullif(regexp_extract(
                           b, '(?is)<link[^>]*href="([^"]+)"', 1), '')
                      ELSE {_fchild("link")} END AS link,
                 CASE WHEN kind = 'atom' THEN {_fchild("id")}
                      ELSE {_fchild("guid")} END AS entry_id,
                 CASE WHEN kind = 'atom'
                      THEN COALESCE({_fchild("published")},
                                    {_fchild("updated")})
                      ELSE {_fchild("pubDate")} END AS published_raw
          FROM blocks)
        SELECT feed_url, kind, title, link, entry_id,
               CASE WHEN regexp_extract(published_raw, '{_rfc}', 1) <> ''
                    THEN regexp_extract(published_raw, '{_rfc}', 3) || '-'
                         || ({_fm_case.replace(
                             "CASE ",
                             "CASE regexp_extract(published_raw, '"
                             + _rfc + "', 2) ")}) || '-'
                         || lpad(regexp_extract(
                                published_raw, '{_rfc}', 1), 2, '0')
                    WHEN regexp_extract(
                         published_raw,
                         '(\\d{{4}})-(\\d{{2}})-(\\d{{2}})', 1) <> ''
                    THEN regexp_extract(published_raw,
                         '(\\d{{4}})-(\\d{{2}})-(\\d{{2}})', 1) || '-'
                      || regexp_extract(published_raw,
                         '(\\d{{4}})-(\\d{{2}})-(\\d{{2}})', 2) || '-'
                      || regexp_extract(published_raw,
                         '(\\d{{4}})-(\\d{{2}})-(\\d{{2}})', 3)
               END AS published,
               published_raw
        FROM fields
        WHERE link IS NOT NULL
    """
    # stream_feed_poll: first-seen over re-polled feeds == the batch
    # extraction (links are unique; the state store's job is proving
    # the re-polled half does NOT double-emit)
    o["stream_feed_poll"] = o["feed_entries"]

    # microdata_stats: both extractors replayed, same normalization
    o["microdata_stats"] = r"""
        WITH page AS (
          SELECT doc_id,
            '<html><body>'
            || CASE WHEN doc_id % 4 = 0 THEN
                 '<div itemscope itemtype="https://schema.org/Article">'
               WHEN doc_id % 4 = 1 THEN
                 '<div itemscope itemtype="http://schema.org/Product">'
                 || '<script>{"@type": "Offer"}</script>'
               WHEN doc_id % 4 = 2 THEN
                 '<script type="application/ld+json">'
                 || '{"@context": "https://schema.org", '
                 || '"@type": "NewsArticle"}</script>'
               ELSE '' END
            || text || '</body></html>' AS html
          FROM documents),
        t AS (
          SELECT unnest(
            regexp_extract_all(
              html, '(?i)itemtype="https?://schema\.org/([^"]+)"', 1)
            || regexp_extract_all(html, '"@type"\s*:\s*"([^"]+)"', 1))
            AS ty
          FROM page)
        SELECT lower(ty) AS schema_type, count(*) AS n_pages
        FROM t GROUP BY lower(ty)
    """


    # epoch_plan: the waterfilling replayed — dyadic caps keep every
    # sat-sum exact in double, so the one division matches bit-for-bit
    o["epoch_plan"] = f"""
        WITH st AS (
          SELECT source,
                 CAST(sum(len({toks_doc})) AS BIGINT) AS n_tokens,
                 CASE CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 3
                      WHEN 0 THEN 1.0 WHEN 1 THEN 2.0
                      ELSE 4.0 END AS max_epochs
          FROM documents GROUP BY source),
        caps AS (SELECT DISTINCT max_epochs AS c FROM st),
        cand AS (
          SELECT c,
                 sum(CASE WHEN s.max_epochs < c
                          THEN s.n_tokens * s.max_epochs
                          ELSE 0 END) AS sat,
                 sum(CASE WHEN s.max_epochs >= c THEN s.n_tokens
                          ELSE 0 END) AS un,
                 max(CASE WHEN s.max_epochs < c THEN s.max_epochs
                          ELSE 0 END) AS prev
          FROM caps, st s GROUP BY c),
        lvl AS (
          SELECT min((60000.0 - sat) / un) AS level
          FROM cand
          WHERE (60000.0 - sat) / un >= prev
            AND (60000.0 - sat) / un < c)
        SELECT source, n_tokens, max_epochs,
               round(least(coalesce(level, max_epochs), max_epochs), 6)
                 AS epochs,
               round(n_tokens
                     * round(least(coalesce(level, max_epochs),
                                   max_epochs), 6), 6) AS alloc_tokens
        FROM st, lvl
    """

    # hreflang_pairs: full replay — tag regexes, attribute extraction,
    # reciprocity self-join, strict url_a < url_b canonicalization
    o["hreflang_pairs"] = r"""
        WITH base AS (
          SELECT doc_id, source,
                 'https://' || source || '.org/'
                 || CAST(doc_id AS VARCHAR) || '/' AS b
          FROM documents),
        pages AS (
          SELECT doc_id, b, b || l AS url,
                 CASE WHEN l = 'fr' AND doc_id % 5 = 0
                      THEN '<html></html>'
                      ELSE '<html><head>'
                        || '<link rel="alternate" hreflang="en" href="'
                        || b || 'en"/>'
                        || '<link rel="alternate" hreflang="de" href="'
                        || b || 'de"/>'
                        || '<link rel="alternate" hreflang="fr" href="'
                        || b || 'fr"/>'
                        || '</head></html>' END AS html
          FROM base, unnest(['en', 'de', 'fr']) AS t(l)),
        tags AS (
          SELECT url,
                 unnest(regexp_extract_all(
                     html, '(?i)<link\b([^>]*hreflang[^>]*)>', 1)) AS tg
          FROM pages),
        alts AS (
          SELECT DISTINCT url,
                 lower(regexp_extract(tg, '(?i)hreflang="([^"]+)"', 1))
                   AS hreflang,
                 regexp_extract(tg, '(?i)href="([^"]+)"', 1) AS alt_url
          FROM tags
          WHERE lower(regexp_extract(tg, '(?i)rel="([^"]+)"', 1))
                  = 'alternate'
            AND regexp_extract(tg, '(?i)hreflang="([^"]+)"', 1) <> ''
            AND regexp_extract(tg, '(?i)href="([^"]+)"', 1) <> '')
        SELECT DISTINCT
               a.url AS url_a, rb.hreflang AS lang_a,
               a.alt_url AS url_b, a.hreflang AS lang_b
        FROM alts a
        JOIN alts rb ON rb.url = a.alt_url AND rb.alt_url = a.url
        WHERE a.url < a.alt_url
    """

    # span_corruption: block slicing + the md5 offset arithmetic in
    # list lambdas; Spark slice(arr, s, len) maps to l[s : s+len-1]
    _t5_off_sql = (
        "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' || "
        "CAST(w AS VARCHAR)), 1, 8))::BIGINT % 18 AS INT)")
    o["span_corruption"] = f"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             w -> w <> '') AS toks
          FROM documents),
        m AS (
          SELECT doc_id, toks, len(toks) AS n,
                 CAST(floor(len(toks) / 20) AS INT) AS nw
          FROM t),
        built AS (
          SELECT doc_id, n, nw,
            flatten(list_transform(range(0, nw), w ->
              toks[w * 20 + 1 : w * 20 + {_t5_off_sql}]
              || ['<extra_id_' || CAST(w AS VARCHAR) || '>']
              || toks[w * 20 + {_t5_off_sql} + 4 : w * 20 + 20]))
            || toks[nw * 20 + 1 : n] AS inputs,
            flatten(list_transform(range(0, nw), w ->
              ['<extra_id_' || CAST(w AS VARCHAR) || '>']
              || toks[w * 20 + {_t5_off_sql} + 1
                      : w * 20 + {_t5_off_sql} + 3]))
            || ['<extra_id_' || CAST(nw AS VARCHAR) || '>'] AS targets
          FROM m)
        SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
               CAST(nw AS BIGINT) AS n_spans,
               array_to_string(inputs, ' ') AS input_text,
               array_to_string(targets, ' ') AS target_text
        FROM built
    """

    # news_pipeline: the feed oracle nests as a subquery; membership on
    # the raw url (sha1 key is injective), rank replay on (host,
    # staleness, url) — the exact w2 ordering select_polite_batch uses
    o["news_pipeline"] = f"""
        WITH cand AS (
          SELECT link AS url, published FROM ({o["feed_entries"]}) ent),
        seen AS (
          SELECT 'https://' || source || '.org/a/'
                 || CAST(doc_id AS VARCHAR) AS url
          FROM documents WHERE doc_id % 6 = 0),
        fresh AS (
          SELECT c.url, c.published,
                 regexp_extract(c.url, '^[a-z]+://([^/]+)', 1) AS host,
                 CAST(coalesce(date_diff('day',
                         try_cast(c.published AS DATE),
                         DATE '2100-01-01'), 99999) AS INT) AS staleness
          FROM cand c
          WHERE c.url NOT IN (SELECT url FROM seen)),
        ranked AS (
          SELECT *, CAST(row_number() OVER (
                   PARTITION BY host ORDER BY staleness, url) AS INT)
                 AS host_rank
          FROM fresh)
        SELECT host, url, published, staleness, host_rank
        FROM ranked WHERE host_rank <= 10
    """

    # host_quality_prior: integer counts, one global division, one
    # mul-add-divide per host — both engines land on the same doubles
    o["host_quality_prior"] = """
        WITH d AS (
          SELECT CASE WHEN (doc_id // 20) % 10 < 8 THEN source
                      ELSE source || '-m'
                           || CAST((doc_id // 20) % 4 AS VARCHAR)
                 END AS host,
                 (n_chars >= 500) AS keep
          FROM documents),
        ph AS (
          SELECT host, count(*) AS n_docs,
                 CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keep
          FROM d GROUP BY host),
        g AS (SELECT CAST(sum(n_keep) AS DOUBLE)
                     / CAST(sum(n_docs) AS DOUBLE) AS g FROM ph)
        SELECT host, n_docs, n_keep,
               round(CAST(n_keep AS DOUBLE) / n_docs, 6) AS raw_rate,
               round((n_keep + 20.0 * g) / (n_docs + 20.0), 6)
                 AS shrunk_rate,
               CASE WHEN round((n_keep + 20.0 * g) / (n_docs + 20.0), 6)
                         >= 0.8 THEN 'trusted'
                    WHEN round((n_keep + 20.0 * g) / (n_docs + 20.0), 6)
                         <= 0.3 THEN 'blocked'
                    ELSE 'neutral' END AS verdict
        FROM ph, g
    """

    # epoch_stream: the epoch_plan oracle nests as the plan; copies +
    # per-epoch keys replay the same md5/2^32 arithmetic
    o["epoch_stream"] = f"""
        WITH plan AS (
          SELECT source, epochs FROM ({o["epoch_plan"]}) p),
        j AS (
          SELECT d.doc_id, d.source, p.epochs
          FROM documents d JOIN plan p USING (source)),
        c AS (
          SELECT doc_id, source,
                 CAST(floor(epochs) AS INT)
                 + CASE WHEN CAST(('0x' || substring(
                         md5('ep|' || CAST(doc_id AS VARCHAR)), 1, 8))
                         ::BIGINT AS DOUBLE) / 4294967296.0
                         < epochs - floor(epochs)
                        THEN 1 ELSE 0 END AS n
          FROM j),
        ex AS (
          SELECT doc_id, source,
                 unnest(list_transform(range(0, n),
                                       x -> CAST(x AS INT))) AS epoch
          FROM c)
        SELECT doc_id, source, epoch,
               md5('ep|' || CAST(epoch AS VARCHAR) || '|'
                   || CAST(doc_id AS VARCHAR)) AS order_key
        FROM ex
    """

    # lang_mismatch: the language_id oracle nests as the detector
    o["lang_mismatch"] = f"""
        WITH pred AS ({o["language_id"]})
        SELECT d.lang AS declared, p.pred_lang AS detected,
               count(*) AS n_docs,
               (d.lang = p.pred_lang) AS agree
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY d.lang, p.pred_lang
    """

    # pagination_chains: recursive CTE replays the bounded ring walk;
    # cycles have no head row so the recursion never admits them
    o["pagination_chains"] = r"""
        WITH RECURSIVE base AS (
          SELECT doc_id,
                 'https://' || source || '.org/a'
                 || CAST(doc_id AS VARCHAR) || '/pg' AS b,
                 CASE WHEN doc_id % 50 = 0 THEN 2
                      ELSE CAST(doc_id % 4 + 1 AS INT) END AS n,
                 (doc_id % 50 = 0) AS cyc
          FROM documents),
        pages AS (
          SELECT b || CAST(i AS VARCHAR) AS url,
                 CASE WHEN i < n THEN
                        '<link rel="next" href="' || b
                        || CAST(i + 1 AS VARCHAR) || '">'
                      WHEN cyc AND i = n THEN
                        '<link rel="next" href="' || b || '1">'
                      ELSE '<html></html>' END AS html
          FROM base, unnest(range(1, n + 1)) AS t(i)),
        tags AS (
          SELECT url,
                 unnest(regexp_extract_all(html, '(?i)<link\b([^>]*)>', 1))
                   AS tg
          FROM pages),
        edges AS (
          SELECT url,
                 min(regexp_extract(tg, '(?i)href="([^"]+)"', 1))
                   AS next_url
          FROM tags
          WHERE lower(regexp_extract(tg, '(?i)rel="([^"]+)"', 1)) = 'next'
            AND regexp_extract(tg, '(?i)href="([^"]+)"', 1) <> ''
          GROUP BY url),
        chains AS (
          SELECT url AS head_url, url, 0 AS position
          FROM edges
          WHERE url NOT IN (SELECT next_url FROM edges)
          UNION ALL
          SELECT c.head_url, e.next_url, c.position + 1
          FROM chains c JOIN edges e ON e.url = c.url
          WHERE c.position < 9)
        SELECT head_url, url, CAST(min(position) AS INT) AS position
        FROM chains GROUP BY head_url, url
    """

    # stitched_chains: the recursive chain walk nested, then texts
    # rebuilt in position order (positions unique per head)
    o["stitched_chains"] = f"""
        WITH chains AS ({o["pagination_chains"]}),
        ptext AS (
          SELECT 'https://' || source || '.org/a'
                 || CAST(doc_id AS VARCHAR) || '/pg'
                 || CAST(i AS VARCHAR) AS url,
                 'part ' || CAST(i AS VARCHAR) || ' of doc '
                 || CAST(doc_id AS VARCHAR) || '.' AS text
          FROM (SELECT doc_id, source,
                       CASE WHEN doc_id % 50 = 0 THEN 2
                            ELSE CAST(doc_id % 4 + 1 AS INT) END AS n
                FROM documents) b,
               unnest(range(1, n + 1)) AS t(i))
        SELECT c.head_url,
               CAST(count(*) AS INT) AS n_pages,
               array_to_string(list(p.text ORDER BY c.position),
                               chr(10)) AS text
        FROM chains c JOIN ptext p ON p.url = c.url
        GROUP BY c.head_url
    """


    # kmv_vocab_sample: bottom-16 by the same md5-prefix hash, members
    # listed in (hash, token) order, (k-1)/u_k estimate replayed
    o["kmv_vocab_sample"] = f"""
        WITH toks AS (
          SELECT DISTINCT source,
                 unnest({_SQL_TOKS.format(
                     t="text || ' tail' || CAST(doc_id % 97 AS VARCHAR)")})
                 AS tok
          FROM documents),
        hashed AS (
          SELECT source, tok,
                 ('0x' || substring(md5(tok), 1, 8))::BIGINT AS h
          FROM toks),
        ranked AS (
          SELECT source, tok, h,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY h, tok) AS rn
          FROM hashed),
        bottom AS (
          SELECT source,
                 list(tok ORDER BY h, tok) AS members,
                 list(h ORDER BY h, tok) AS hashes,
                 count(*) AS n
          FROM ranked WHERE rn <= 16 GROUP BY source)
        SELECT source, members,
               CASE WHEN n < 16 THEN CAST(n AS DOUBLE)
                    ELSE round(15.0 / (hashes[16] / 4294967296.0), 6)
               END AS distinct_est,
               CAST(n AS INT) AS sample_size
        FROM bottom
    """

    # merge_plan: the tier ladder generated from the same constants,
    # keyed windows replayed, integer group arithmetic
    from commoncrawl_spark.tables import MERGE_TIER_MAX

    _tier_case = ("CASE " + " ".join(
        f"WHEN bytes < {(1 << 20) * (1 << (t + 1))} THEN {t}"
        for t in range(MERGE_TIER_MAX))
        + f" ELSE {MERGE_TIER_MAX} END")
    o["merge_plan"] = f"""
        WITH segs AS (
          SELECT 'seg-' || CAST(doc_id AS VARCHAR) AS segment_id,
                 CAST(1048576 * (1 + doc_id % 30) + n_chars AS BIGINT)
                   AS bytes
          FROM documents),
        tiered AS (SELECT *, {_tier_case} AS tier FROM segs),
        ranked AS (
          SELECT *,
                 CAST(row_number() OVER (
                     PARTITION BY tier ORDER BY bytes, segment_id)
                   AS INT) AS tier_rank,
                 count(*) OVER (PARTITION BY tier) AS n
          FROM tiered)
        SELECT segment_id, bytes, tier, tier_rank,
               CASE WHEN (floor((tier_rank - 1) / 4) + 1) * 4 <= n
                    THEN CAST(floor((tier_rank - 1) / 4) AS INT) END
                 AS merge_group
        FROM ranked
    """

    # lm_quality: identical unigram MLE — cnt/total is one double
    # division on both sides, avg(ln) rounded to the compare grain
    o["lm_quality"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        counts AS (
          SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        tot AS (
          SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM counts),
        scored AS (
          SELECT t.doc_id, count(*) AS n_tokens,
                 round(avg(ln(CAST(c.cnt AS DOUBLE) / tot.total)), 6)
                   AS avg_logprob
          FROM toks t JOIN counts c USING (token), tot
          GROUP BY t.doc_id)
        SELECT d.doc_id,
               coalesce(s.n_tokens, 0) AS n_tokens,
               s.avg_logprob
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """

    # lm_bigram: parallel unnests zip positionally in DuckDB, giving the
    # same consecutive-pair stream; division/ln/avg mirror the columns
    o["lm_bigram"] = f"""
        WITH toks AS (
          SELECT doc_id, {toks_doc} AS t FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(t[1:len(t) - 1]) AS w1,
                 unnest(t[2:len(t)]) AS w2
          FROM toks WHERE len(t) >= 2),
        counts AS (
          SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2),
        ctx AS (
          SELECT w1, CAST(sum(cnt) AS DOUBLE) AS c1 FROM counts
          GROUP BY w1),
        scored AS (
          SELECT b.doc_id, count(*) AS n_bigrams,
                 round(avg(ln(CAST(c.cnt AS DOUBLE) / x.c1)), 6)
                   AS avg_logprob
          FROM bg b
          JOIN counts c USING (w1, w2)
          JOIN ctx x USING (w1)
          GROUP BY b.doc_id)
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               s.avg_logprob
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """

    # lm_bigram_autogate: identical math — the broadcast gate is
    # physical-only, so the auto-gated scorer must reproduce the
    # hinted scorer's hashes against the very same SQL
    o["lm_bigram_autogate"] = o["lm_bigram"]

    # lm_kneser_ney: the exact interpolated-KN arithmetic replayed
    # operand-for-operand (discount 0.75 as the same double literal);
    # n_follow/n_precede/T are row counts over the distinct-pair table
    o["lm_kneser_ney"] = f"""
        WITH toks AS (
          SELECT doc_id, {toks_doc} AS t FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(t[1:len(t) - 1]) AS w1,
                 unnest(t[2:len(t)]) AS w2
          FROM toks WHERE len(t) >= 2),
        counts AS (
          SELECT w1, w2, count(*) AS cnt FROM bg GROUP BY w1, w2),
        ctx AS (
          SELECT w1, CAST(sum(cnt) AS DOUBLE) AS c1,
                 CAST(count(*) AS DOUBLE) AS n_follow
          FROM counts GROUP BY w1),
        cont AS (
          SELECT w2, CAST(count(*) AS DOUBLE) AS n_precede
          FROM counts GROUP BY w2),
        tt AS (SELECT CAST(count(*) AS DOUBLE) AS types FROM counts),
        scored AS (
          SELECT b.doc_id, count(*) AS n_bigrams,
                 round(avg(ln(
                   greatest(CAST(c.cnt AS DOUBLE) - 0.75, 0.0) / x.c1
                   + (0.75 * x.n_follow / x.c1)
                     * (k.n_precede / tt.types))), 6) AS avg_logprob
          FROM bg b
          JOIN counts c USING (w1, w2)
          JOIN ctx x USING (w1)
          JOIN cont k USING (w2)
          CROSS JOIN tt
          GROUP BY b.doc_id)
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               s.avg_logprob
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """

    # stupid_backoff: train tables on the even-doc_id half; per pair
    # cnt/ctx when seen else 0.4 * ucnt / N; docs with a token outside
    # the unigram table are NULL (arithmetic operand-for-operand like
    # the Spark columns)
    o["stupid_backoff"] = f"""
        WITH toks AS (
          SELECT doc_id, {toks_doc} AS t FROM documents),
        uni AS (
          SELECT token, count(*) AS ucnt FROM (
            SELECT unnest(t) AS token FROM toks WHERE doc_id % 2 = 0)
          GROUP BY token),
        tot AS (SELECT CAST(sum(ucnt) AS DOUBLE) AS n FROM uni),
        counts AS (
          SELECT w1, w2, count(*) AS cnt FROM (
            SELECT unnest(t[1:len(t) - 1]) AS w1,
                   unnest(t[2:len(t)]) AS w2
            FROM toks WHERE doc_id % 2 = 0 AND len(t) >= 2)
          GROUP BY w1, w2),
        ctx AS (
          SELECT w1, CAST(sum(cnt) AS DOUBLE) AS c1 FROM counts
          GROUP BY w1),
        bg AS (
          SELECT doc_id,
                 unnest(t[1:len(t) - 1]) AS w1,
                 unnest(t[2:len(t)]) AS w2
          FROM toks WHERE len(t) >= 2),
        scored AS (
          SELECT b.doc_id, count(*) AS n_bigrams,
                 round(avg(ln(CASE
                   WHEN c.cnt IS NOT NULL
                     THEN CAST(c.cnt AS DOUBLE) / x.c1
                   ELSE 0.4 * CAST(u.ucnt AS DOUBLE) / tot.n
                 END)), 6) AS _avg,
                 sum(CASE WHEN c.cnt IS NULL AND u.ucnt IS NULL
                     THEN 1 ELSE 0 END) AS _oov
          FROM bg b
          LEFT JOIN counts c USING (w1, w2)
          LEFT JOIN ctx x USING (w1)
          LEFT JOIN uni u ON b.w2 = u.token, tot
          GROUP BY b.doc_id)
        SELECT d.doc_id,
               coalesce(s.n_bigrams, 0) AS n_bigrams,
               CASE WHEN s._oov > 0 THEN NULL ELSE s._avg END
                 AS avg_logscore
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """

    # dsir_weights: Laplace-smoothed unigram log-ratio, target =
    # lang='de' slice, pool = all documents; joint vocab via full
    # outer join; per-doc mean weighted by term frequency
    o["dsir_weights"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        tgt AS (
          SELECT token, count(*) AS ct FROM (
            SELECT unnest({toks_doc}) AS token FROM documents
            WHERE lang = 'de') GROUP BY token),
        bkg AS (
          SELECT token, count(*) AS cb FROM toks GROUP BY token),
        vocab AS (
          SELECT coalesce(t.token, b.token) AS token,
                 coalesce(t.ct, 0) AS ct,
                 coalesce(b.cb, 0) AS cb
          FROM tgt t FULL JOIN bkg b ON t.token = b.token),
        tot AS (
          SELECT CAST(sum(ct) AS DOUBLE) AS nt,
                 CAST(sum(cb) AS DOUBLE) AS nb,
                 count(*) AS v
          FROM vocab),
        tf AS (
          SELECT doc_id, token, count(*) AS tfq FROM toks
          GROUP BY doc_id, token),
        scored AS (
          SELECT f.doc_id,
                 CAST(sum(f.tfq) AS BIGINT) AS n_tokens,
                 round(sum(CAST(f.tfq AS DOUBLE) * ln(
                   ((CAST(w.ct AS DOUBLE) + 1.0) / (tot.nt + 1.0 * tot.v))
                   / ((CAST(w.cb AS DOUBLE) + 1.0) / (tot.nb + 1.0 * tot.v))
                 )) / sum(f.tfq), 6) AS avg_logratio
          FROM tf f JOIN vocab w USING (token), tot
          GROUP BY f.doc_id)
        SELECT d.doc_id,
               coalesce(s.n_tokens, 0) AS n_tokens,
               s.avg_logratio
        FROM documents d LEFT JOIN scored s USING (doc_id)
    """

    # token_budget_sample: whitespace token totals per lang, keep_frac
    # = least(1, budget/total), md5-uniform per-doc keep — the same
    # '0x'||md5-prefix bucket family as split_assign/shard_assign
    o["token_budget_sample"] = """
        WITH wn AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(
                   string_split_regex(text, '\\s+'), x -> x <> ''))
                 AS BIGINT) AS n_tokens
          FROM documents),
        gt AS (
          SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS group_tokens
          FROM wn GROUP BY lang),
        b(lang, budget_tokens) AS (
          VALUES ('en', 2000), ('de', 100000), ('fr', 500)),
        fr AS (
          SELECT g.lang,
                 least(1.0, CAST(b.budget_tokens AS DOUBLE)
                            / g.group_tokens) AS keep_frac
          FROM gt g JOIN b USING (lang))
        SELECT w.doc_id, w.lang, w.n_tokens, f.keep_frac
        FROM wn w JOIN fr f USING (lang)
        WHERE CAST(('0x' || substring(md5(CAST(w.doc_id AS VARCHAR)),
                                      1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < f.keep_frac
    """

    o["temperature_mix"] = """
        WITH wn AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(
                   string_split_regex(text, '\\s+'), x -> x <> ''))
                 AS BIGINT) AS n_tokens
          FROM documents),
        gt AS (
          SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS group_tokens
          FROM wn GROUP BY lang),
        pw AS (
          SELECT lang, group_tokens,
                 round(pow(group_tokens, 0.5), 6) AS mass
          FROM gt),
        tt AS (SELECT sum(mass) AS total_mass FROM pw),
        b AS (
          SELECT lang, group_tokens,
                 CAST(floor(30000 * mass / total_mass) AS BIGINT)
                   AS budget_tokens
          FROM pw, tt),
        fr AS (
          SELECT lang,
                 least(1.0, CAST(budget_tokens AS DOUBLE)
                            / group_tokens) AS keep_frac
          FROM b)
        SELECT w.doc_id, w.lang, w.n_tokens, f.keep_frac
        FROM wn w JOIN fr f USING (lang)
        WHERE CAST(('0x' || substring(md5(CAST(w.doc_id AS VARCHAR)),
                                      1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < f.keep_frac
    """

    # sequence_pack: the packing arithmetic replayed exactly — per-shard
    # running sum of (tokens + 1 EOD) in doc_id order, then each doc
    # explodes over the 256-token sequences its global span intersects;
    # all-integer, so the hash comparison is exact
    o["sequence_pack"] = """
        WITH d AS (
          SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard,
                 CAST(len(list_filter(
                   string_split_regex(text, '\\s+'), x -> x <> ''))
                 AS BIGINT) AS n
          FROM documents),
        o AS (
          SELECT doc_id, shard, n,
                 CAST(COALESCE(SUM(n + 1) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS off
          FROM d WHERE n > 0)
        SELECT shard,
               g.seq_id,
               doc_id,
               GREATEST(off, g.seq_id * 256) - off AS doc_start,
               LEAST(off + n, (g.seq_id + 1) * 256)
                 - GREATEST(off, g.seq_id * 256) AS n_tokens,
               GREATEST(off, g.seq_id * 256) - g.seq_id * 256 AS seq_pos
        FROM o
        CROSS JOIN UNNEST(generate_series(off // 256, (off + n - 1) // 256))
          AS g(seq_id)
    """

    # duplicate_spans: 1-based window positions on both sides; the
    # interval-union fold is the same least(k, gap) sum over sorted
    # positions; md5 over the space-joined window text
    o["duplicate_spans"] = f"""
        WITH base AS (
          SELECT doc_id, {toks_doc} AS t,
                 len({toks_doc}) AS n_tokens
          FROM documents),
        h AS (
          SELECT doc_id, pos,
                 md5(array_to_string(t[pos:pos + 19], ' ')) AS gram
          FROM (SELECT doc_id, t,
                       unnest(range(1, len(t) - 20 + 2)) AS pos
                FROM base WHERE len(t) >= 20)),
        c AS (SELECT gram FROM h GROUP BY gram HAVING count(*) >= 2),
        s AS (
          SELECT doc_id, count(*) AS n_dup_grams,
                 list_sort(list(pos)) AS ps
          FROM h JOIN c USING (gram) GROUP BY doc_id),
        u AS (
          SELECT doc_id, n_dup_grams,
                 CAST(coalesce(list_sum(list_transform(
                   range(1, len(ps)),
                   i -> least(20, ps[i + 1] - ps[i]))), 0) AS BIGINT)
                 + 20 AS dup_tokens
          FROM s)
        SELECT b.doc_id,
               CAST(b.n_tokens AS BIGINT) AS n_tokens,
               coalesce(u.n_dup_grams, 0) AS n_dup_grams,
               coalesce(u.dup_tokens, 0) AS dup_tokens,
               CASE WHEN b.n_tokens > 0
                 THEN round(CAST(coalesce(u.dup_tokens, 0) AS DOUBLE)
                            / b.n_tokens, 6)
                 ELSE 0.0 END AS dup_fraction
        FROM base b LEFT JOIN u USING (doc_id)
    """

    # exactsubstr_strip: the duplicate_spans gram CTEs, then token i is
    # cut iff a duplicated window STARTS in [i-19, i] (NOT EXISTS
    # replays the zip-shift sliding OR), rebuild = string_agg over the
    # survivors in position order
    o["exactsubstr_strip"] = f"""
        WITH base AS (
          SELECT doc_id, {toks_doc} AS t,
                 len({toks_doc}) AS n
          FROM documents),
        h AS (
          SELECT doc_id, pos,
                 md5(array_to_string(t[pos:pos + 19], ' ')) AS gram
          FROM (SELECT doc_id, t,
                       unnest(range(1, len(t) - 20 + 2)) AS pos
                FROM base WHERE len(t) >= 20)),
        c AS (SELECT gram FROM h GROUP BY gram HAVING count(*) >= 2),
        st AS (SELECT doc_id, pos FROM h JOIN c USING (gram)),
        tk AS (
          SELECT doc_id, unnest(range(1, n + 1)) AS i
          FROM base WHERE n > 0),
        kept AS (
          SELECT tk.doc_id, tk.i FROM tk
          WHERE NOT EXISTS (
            SELECT 1 FROM st
            WHERE st.doc_id = tk.doc_id
              AND st.pos BETWEEN tk.i - 19 AND tk.i)),
        rebuilt AS (
          SELECT k.doc_id,
                 string_agg(b.t[k.i], ' ' ORDER BY k.i) AS text,
                 count(*) AS n_kept
          FROM kept k JOIN base b USING (doc_id)
          GROUP BY k.doc_id)
        SELECT b.doc_id, coalesce(r.text, '') AS text,
               CAST(b.n AS BIGINT) AS n_tokens,
               CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
        FROM base b LEFT JOIN rebuilt r USING (doc_id)
    """

    # winnowing (Schleimer et al. 2003): k=4 token grams hashed via the
    # md5-prefix idiom, w=8 window minima, distinct per doc; DuckDB's
    # 1-based inclusive list slices match F.slice, range() is
    # end-exclusive, and both engines clip slices at the array end
    _winnow_cte = f"""
        base AS (
          SELECT doc_id, {toks_doc} AS t, len({toks_doc}) AS n
          FROM documents),
        h AS (
          SELECT doc_id,
                 list_transform(range(1, n - 4 + 2),
                   p -> ('0x' || substring(md5(array_to_string(
                          t[p:p + 3], ' ')), 1, 8))::BIGINT) AS hs
          FROM base WHERE n >= 4),
        fpx AS (
          SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(hs) - 8 + 1, 1) + 1),
                   i -> list_min(hs[i:i + 7])))) AS fp
          FROM h)"""

    o["winnow_fps"] = f"""
        WITH {_winnow_cte}
        SELECT doc_id, count(*) AS n_fps, min(fp) AS fp_min,
               max(fp) AS fp_max, CAST(sum(fp) AS BIGINT) AS fp_sum
        FROM fpx GROUP BY doc_id
    """

    o["winnow_pairs"] = f"""
        WITH {_winnow_cte},
        tot AS (SELECT doc_id, count(*) AS n FROM fpx GROUP BY doc_id),
        rare AS (SELECT fp FROM fpx GROUP BY fp HAVING count(*) <= 50),
        hf2 AS (SELECT fpx.* FROM fpx SEMI JOIN rare USING (fp)),
        pairs AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 count(*) AS shared
          FROM hf2 a JOIN hf2 b USING (fp)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT doc_a, doc_b, shared, ta.n AS n_a, tb.n AS n_b,
               round(shared / CAST(least(ta.n, tb.n) AS DOUBLE), 6)
                 AS overlap
        FROM pairs
        JOIN tot ta ON ta.doc_id = pairs.doc_a
        JOIN tot tb ON tb.doc_id = pairs.doc_b
        WHERE shared >= 2
    """

    # NB classifier: same Laplace arithmetic as the dsir oracle, plus
    # class priors, the md5 80/20 split, and OOV-dropped scoring
    # model CTEs (trained on the full documents table's 80% bucket) and
    # a source-parameterized scoring tail, so composed pipelines can
    # score any gated subset with the SAME model arithmetic
    def _nb_score_cte(src: str) -> str:
        return f"""tfq AS (
          SELECT doc_id, token, count(*) AS tf FROM (
            SELECT doc_id, unnest({toks_doc}) AS token FROM {src})
          GROUP BY doc_id, token),
        sums AS (
          SELECT t.doc_id,
                 CAST(sum(t.tf) AS BIGINT) AS n_tokens,
                 sum(t.tf * coalesce(m.log_odds, 0.0)) AS lo
          FROM tfq t LEFT JOIN model m USING (token)
          GROUP BY t.doc_id),
        sc AS (
          SELECT {src}.doc_id,
                 coalesce(s.n_tokens, 0) AS n_tokens,
                 round(pri.lp + coalesce(s.lo, 0.0), 6) AS score,
                 (pri.lp + coalesce(s.lo, 0.0)) > 0 AS pred
          FROM {src} LEFT JOIN sums s USING (doc_id), pri)"""

    def _nb_model(label: str) -> str:
        return f"""
        lab AS (
          SELECT doc_id, text, ({label}) AS label,
                 ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 5 AS b
          FROM documents),
        tr AS (SELECT * FROM lab WHERE b < 4),
        te AS (SELECT * FROM lab WHERE b = 4),
        cp AS (
          SELECT token, count(*) AS cpn FROM (
            SELECT unnest({toks_doc}) AS token FROM tr WHERE label)
          GROUP BY token),
        cn AS (
          SELECT token, count(*) AS cnn FROM (
            SELECT unnest({toks_doc}) AS token FROM tr WHERE NOT label)
          GROUP BY token),
        vocab AS (
          SELECT coalesce(cp.token, cn.token) AS token,
                 coalesce(cpn, 0) AS cpn, coalesce(cnn, 0) AS cnn
          FROM cp FULL JOIN cn ON cp.token = cn.token),
        tot AS (
          SELECT CAST(sum(cpn) AS DOUBLE) AS np,
                 CAST(sum(cnn) AS DOUBLE) AS nn,
                 count(*) AS v
          FROM vocab),
        model AS (
          SELECT token,
                 ln(((CAST(cpn AS DOUBLE) + 1.0) / (tot.np + 1.0 * tot.v))
                    / ((CAST(cnn AS DOUBLE) + 1.0)
                       / (tot.nn + 1.0 * tot.v))) AS log_odds
          FROM vocab, tot),
        pri AS (
          SELECT ln((CAST(sum(CASE WHEN label THEN 1 ELSE 0 END)
                          AS DOUBLE) + 1.0)
                    / (CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END)
                            AS DOUBLE) + 1.0)) AS lp
          FROM tr)"""

    _nb_cte = _nb_model("lang = 'de'") + ",\n        " + _nb_score_cte("te")

    o["nb_classifier_scores"] = f"""
        WITH {_nb_cte}
        SELECT doc_id, n_tokens, score, pred FROM sc
    """

    o["nb_classifier_eval"] = f"""
        WITH {_nb_cte}
        SELECT te.label, sc.pred, count(*) AS n,
               round(avg(sc.score), 6) AS avg_score
        FROM sc JOIN te USING (doc_id)
        GROUP BY te.label, sc.pred
    """

    # nb_platt_calibration: the en-vs-rest NB closed form (CTEs above,
    # scored over the WHOLE corpus) feeding 8 unrolled GD rounds of the
    # two-feature calibrator on the held-out bucket — same quantized
    # gradient sums and 6dp rounding as logreg_quality
    _pl_grad = (
        "round(MIN(w.{c}) - 4.0 * round(CAST(SUM(CAST(round((p - y){x}"
        " * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(*), 6),"
        " 6) AS {c}")
    _pl_iter = """
        qq{i} AS (
          SELECT s.*, round(1.0 / (1.0 + exp(-round(
            w.b + w.c1 * s.x1 + w.c2 * s.x2, 6))), 6) AS p
          FROM cal s, vt{p} w),
        vt{i} AS (
          SELECT """ + ", ".join(
        _pl_grad.format(c=c, x=x)
        for c, x in [("b", " * 1.0"), ("c1", " * x1"),
                     ("c2", " * x2")]) + """
          FROM qq{i}, vt{p} w)"""
    o["nb_platt_calibration"] = f"""
        WITH {_nb_model("lang = 'de'")},
        {_nb_score_cte("documents")},
        f AS (
          SELECT doc_id, round(score, 6) AS x1,
                 round(n_tokens / 100.0, 6) AS x2
          FROM sc),
        cal AS (
          SELECT CASE WHEN lab.label THEN 1.0 ELSE 0.0 END AS y,
                 f.x1, f.x2
          FROM f JOIN lab USING (doc_id) WHERE lab.b = 4),
        vt0 AS (SELECT 0.0 AS b, 0.0 AS c1, 0.0 AS c2),
        {",".join(_pl_iter.format(i=i, p=i - 1) for i in range(1, 9))}
        SELECT doc_id, x1, p,
               CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred
        FROM (
          SELECT f.*, round(1.0 / (1.0 + exp(-round(
            w.b + w.c1 * f.x1 + w.c2 * f.x2, 6))), 6) AS p
          FROM f, vt8 w) s
    """

    # postings_delta: same build (distinct (doc, token) -> sorted id
    # list), same zip-shift gaps, same varint CASE chain
    _vb = ("CASE WHEN {v} < 128 THEN 1 WHEN {v} < 16384 THEN 2 "
           "WHEN {v} < 2097152 THEN 3 WHEN {v} < 268435456 THEN 4 "
           "ELSE 5 END")
    o["postings_delta"] = f"""
        WITH dt AS (
          SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id, unnest({toks_doc}) AS token FROM documents)),
        p AS (
          SELECT token, COUNT(*) AS df,
                 list_sort(list(doc_id)) AS ids
          FROM dt GROUP BY token),
        enc AS (
          SELECT token, df, ids[1] AS first_id,
                 list_transform(range(2, len(ids) + 1),
                                i -> ids[i] - ids[i - 1]) AS gaps
          FROM p),
        cost AS (
          SELECT token, df, first_id,
                 CAST(8 * df AS BIGINT) AS bytes_raw,
                 CAST({_vb.format(v="first_id")}
                      + coalesce(list_sum(list_transform(gaps,
                          g -> {_vb.format(v="g")})), 0)
                      AS BIGINT) AS bytes_delta
          FROM enc)
        SELECT token, df, first_id, bytes_raw, bytes_delta,
               round(bytes_delta / CAST(bytes_raw AS DOUBLE), 6) AS ratio
        FROM cost
    """

    # stream_enrich: the streaming pipeline's batch twin — same ip
    # derivation, same containment join, counts per asn (NULL = gap)
    o["stream_enrich"] = """
        WITH pts AS (
          SELECT event_id,
                 CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)),
                                         1, 4))::INTEGER % 62500
                      AS BIGINT) AS ip
          FROM events),
        rng AS (
          SELECT n_nationkey * 2500 AS lo,
                 n_nationkey * 2500 + 1999 AS hi,
                 n_name AS asn
          FROM nation)
        SELECT r.asn, COUNT(*) AS n
        FROM pts p LEFT JOIN rng r ON p.ip BETWEEN r.lo AND r.hi
        GROUP BY r.asn
    """

    # vocab_growth: same prefix semantics — per-term min first id,
    # cutoff theta-join against the 10-row frame
    o["vocab_growth"] = f"""
        WITH toks AS (
          SELECT doc_id AS id, {toks_doc} AS t FROM documents),
        mx AS (SELECT MAX(id) AS m FROM toks),
        cuts AS (
          SELECT p.point,
                 CAST(FLOOR(mx.m * p.point / 10.0) AS BIGINT) AS cutoff_id
          FROM (SELECT unnest(range(1, 11)) AS point) p, mx),
        firsts AS (
          SELECT term, MIN(id) AS f FROM (
            SELECT id, unnest(t) AS term FROM toks) u
          GROUP BY term),
        vocab AS (
          SELECT c.point, c.cutoff_id, COUNT(*) AS vocab
          FROM firsts JOIN cuts c ON firsts.f <= c.cutoff_id
          GROUP BY 1, 2),
        mass AS (
          SELECT c.point, c.cutoff_id, COUNT(*) AS n_docs,
                 CAST(SUM(len(t)) AS BIGINT) AS n_tokens
          FROM toks JOIN cuts c ON toks.id <= c.cutoff_id
          GROUP BY 1, 2)
        SELECT m.point, m.cutoff_id, m.n_docs, m.n_tokens, v.vocab
        FROM mass m JOIN vocab v USING (point, cutoff_id)
    """

    # url_tree: same URL synthesis as url_features, same prefix
    # expansion (root + bounded range transform), same depth formula
    o["url_tree"] = """
        WITH u AS (
          SELECT 'https://www.' || source || '.org' ||
            CASE doc_id % 4
              WHEN 0 THEN ''
              WHEN 1 THEN '/a/b/c/page' || CAST(doc_id AS VARCHAR)
              WHEN 2 THEN '/item?id=' || CAST(doc_id AS VARCHAR)
                          || '&ref=feed&x=1'
              ELSE '/p' || CAST(doc_id % 7 AS VARCHAR) || '/'
            END AS url
          FROM documents),
        parts AS (
          SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
                 list_filter(string_split(
                   regexp_extract(url, '^[a-z]+://[^/?#]*([^?#]*)', 1),
                   '/'), x -> x <> '') AS segs
          FROM u),
        pref AS (
          SELECT host, unnest(
            ['/'] || list_transform(
              range(1, least(3, len(segs)) + 1),
              i -> '/' || array_to_string(segs[1:i], '/'))) AS prefix
          FROM parts)
        SELECT host,
               CAST(length(prefix) - length(replace(prefix, '/', ''))
                    - CASE WHEN prefix = '/' THEN 1 ELSE 0 END
                    AS BIGINT) AS depth,
               prefix, COUNT(*) AS n_urls
        FROM pref GROUP BY host, prefix
    """

    # degree_histogram / reciprocal_links: the same %97 synthetic host
    # graph; bucket via length(bin(d)) - 1 (exact integer floor-log2,
    # DuckDB bin() == Spark bin() for positive ints)
    _dg_edges = """
        raw AS (
          SELECT doc_id % 97 AS src, (doc_id * doc_id + 1) % 97 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 97, (doc_id * 17 + 3) % 41 FROM documents),
        e AS (SELECT DISTINCT src, dst FROM raw)"""
    o["degree_histogram"] = f"""
        WITH {_dg_edges},
        od AS (SELECT src AS node, COUNT(*) AS degree FROM e GROUP BY 1),
        idg AS (SELECT dst AS node, COUNT(*) AS degree FROM e GROUP BY 1),
        b AS (
          SELECT 'out' AS direction,
                 CAST(length(bin(degree)) - 1 AS BIGINT) AS bucket,
                 degree FROM od
          UNION ALL
          SELECT 'in', CAST(length(bin(degree)) - 1 AS BIGINT), degree
          FROM idg)
        SELECT direction, bucket, COUNT(*) AS n_nodes,
               MIN(degree) AS min_degree, MAX(degree) AS max_degree
        FROM b GROUP BY 1, 2
    """

    o["reciprocal_links"] = f"""
        WITH {_dg_edges},
        ne AS (SELECT src, dst FROM e WHERE src <> dst),
        per AS (SELECT src, COUNT(*) AS n_out FROM ne GROUP BY src),
        rec AS (
          SELECT a.src, COUNT(*) AS n_rec
          FROM ne a
          WHERE EXISTS (SELECT 1 FROM ne b
                        WHERE b.src = a.dst AND b.dst = a.src)
          GROUP BY a.src)
        SELECT per.src AS node, per.n_out,
               COALESCE(rec.n_rec, 0) AS n_reciprocal,
               round(COALESCE(rec.n_rec, 0) / CAST(per.n_out AS DOUBLE), 6)
                 AS reciprocity
        FROM per LEFT JOIN rec USING (src)
    """

    # filtering_pipeline: Gopher line rules (min_words=30) -> n-gram
    # repetition gate (the _grep_chain CTEs over the gate-A survivors)
    # -> NB model gate (model trained on the FULL corpus's 80% bucket,
    # scoring the survivors via the parameterized tail) -> exact dedup
    # (min-id per normalized fingerprint). Every gate's arithmetic is
    # byte-identical to its standalone oracle.
    o["filtering_pipeline"] = f"""
        WITH ga AS (
          SELECT doc_id, text, lang FROM (
            SELECT doc_id, text, lang,
              list_filter(list_transform(string_split(text, chr(10)),
                                         l -> trim(l)), l -> l != '') AS lines,
              list_filter(regexp_split_to_array(text, '\\s+'),
                          w -> w != '') AS words
            FROM documents)
          WHERE len(words) BETWEEN 30 AND 100000
            AND round(coalesce(list_sum(list_transform(words,
                  w -> length(w))), 0) / greatest(len(words), 1), 4)
                BETWEEN 3 AND 10
            AND round((len(regexp_extract_all(text, '#'))
                       + len(regexp_extract_all(text, '(\\.\\.\\.|…)')))
                / greatest(len(words), 1), 4) < 0.1
            AND round(len(list_filter(lines,
                  l -> regexp_matches(l, '^[-*•]')))
                / greatest(len(lines), 1), 4) < 0.9
            AND round(len(list_filter(lines,
                  l -> regexp_matches(l, '(\\.\\.\\.|…)$')))
                / greatest(len(lines), 1), 4) < 0.3
            AND round(len(list_filter(words,
                  w -> regexp_matches(w, '[A-Za-z]')))
                / greatest(len(words), 1), 4) > 0.8
            AND round(1.0 - len(list_distinct(lines))
                / greatest(len(lines), 1), 4) < 0.3
            AND round(1.0 - coalesce(list_sum(list_transform(
                  list_distinct(lines), l -> length(l))), 0)
                / greatest(coalesce(list_sum(list_transform(lines,
                  l -> length(l))), 0), 1), 4) < 0.3),
        {_grep_chain("ga")},
        gb AS (
          SELECT ga.doc_id, ga.text, ga.lang
          FROM ga JOIN fr USING (doc_id)
          WHERE {_g_keep}),
        {_nb_model("lang = 'en'")},
        {_nb_score_cte("gb")},
        gc AS (
          SELECT gb.doc_id, gb.lang, gb.text, sc.score
          FROM gb JOIN sc USING (doc_id)
          WHERE sc.pred),
        fp AS (
          SELECT doc_id, lang, score,
                 md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                         'g'))) AS f
          FROM gc),
        keepers AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
        SELECT fp.doc_id, fp.lang, fp.score
        FROM fp JOIN keepers USING (f, doc_id)
    """

    # selection_pipeline: the dsir_weights / duplicate_spans /
    # token_budget_sample oracles chained with the same stage order and
    # thresholds; each stage's arithmetic is identical to its
    # standalone oracle, applied to the previous stage's survivors
    o["selection_pipeline"] = f"""
        WITH toks0 AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        tgt AS (
          SELECT token, count(*) AS ct FROM (
            SELECT unnest({toks_doc}) AS token FROM documents
            WHERE lang = 'de') GROUP BY token),
        bkg AS (
          SELECT token, count(*) AS cb FROM toks0 GROUP BY token),
        vocab AS (
          SELECT coalesce(t.token, b.token) AS token,
                 coalesce(t.ct, 0) AS ct,
                 coalesce(b.cb, 0) AS cb
          FROM tgt t FULL JOIN bkg b ON t.token = b.token),
        tot AS (
          SELECT CAST(sum(ct) AS DOUBLE) AS nt,
                 CAST(sum(cb) AS DOUBLE) AS nb,
                 count(*) AS v
          FROM vocab),
        tf0 AS (
          SELECT doc_id, token, count(*) AS tfq FROM toks0
          GROUP BY doc_id, token),
        dsir AS (
          SELECT f.doc_id,
                 round(sum(CAST(f.tfq AS DOUBLE) * ln(
                   ((CAST(w.ct AS DOUBLE) + 1.0) / (tot.nt + 1.0 * tot.v))
                   / ((CAST(w.cb AS DOUBLE) + 1.0) / (tot.nb + 1.0 * tot.v))
                 )) / sum(f.tfq), 6) AS avg_logratio
          FROM tf0 f JOIN vocab w USING (token), tot
          GROUP BY f.doc_id),
        d1 AS (
          SELECT d.* FROM documents d
          JOIN dsir s USING (doc_id)
          WHERE s.avg_logratio >= 0.0),
        span_base AS (
          SELECT doc_id, {toks_doc} AS t,
                 len({toks_doc}) AS n_tokens
          FROM d1),
        h AS (
          SELECT doc_id, pos,
                 md5(array_to_string(t[pos:pos + 19], ' ')) AS gram
          FROM (SELECT doc_id, t,
                       unnest(range(1, len(t) - 20 + 2)) AS pos
                FROM span_base WHERE len(t) >= 20)),
        c AS (SELECT gram FROM h GROUP BY gram HAVING count(*) >= 2),
        sp AS (
          SELECT doc_id, list_sort(list(pos)) AS ps
          FROM h JOIN c USING (gram) GROUP BY doc_id),
        u AS (
          SELECT doc_id,
                 CAST(coalesce(list_sum(list_transform(
                   range(1, len(ps)),
                   i -> least(20, ps[i + 1] - ps[i]))), 0) AS BIGINT)
                 + 20 AS dup_tokens
          FROM sp),
        stats AS (
          SELECT b.doc_id,
                 CASE WHEN b.n_tokens > 0
                   THEN round(CAST(coalesce(u.dup_tokens, 0) AS DOUBLE)
                              / b.n_tokens, 6)
                   ELSE 0.0 END AS dup_fraction
          FROM span_base b LEFT JOIN u USING (doc_id)),
        d2 AS (
          SELECT d1.* FROM d1
          JOIN stats USING (doc_id)
          WHERE stats.dup_fraction <= 0.5),
        wn AS (
          SELECT doc_id, lang,
                 CAST(len(list_filter(
                   string_split_regex(text, '\\s+'), x -> x <> ''))
                 AS BIGINT) AS n_tokens
          FROM d2),
        gt AS (
          SELECT lang, CAST(sum(n_tokens) AS DOUBLE) AS group_tokens
          FROM wn GROUP BY lang),
        b(lang, budget_tokens) AS (
          VALUES ('en', 1500), ('de', 100000), ('zh', 400)),
        fr AS (
          SELECT g.lang,
                 least(1.0, CAST(b.budget_tokens AS DOUBLE)
                            / g.group_tokens) AS keep_frac
          FROM gt g JOIN b USING (lang))
        SELECT w.doc_id, w.lang, w.n_tokens, f.keep_frac
        FROM wn w JOIN fr f USING (lang)
        WHERE CAST(('0x' || substring(md5(CAST(w.doc_id AS VARCHAR)),
                                      1, 8))::BIGINT AS DOUBLE)
              / 4294967296.0 < f.keep_frac
    """

    # recrawl_priority: lag/groupBy change stats + the bias-corrected
    # Poisson rate; arithmetic written operand-for-operand like the
    # Spark columns so the doubles agree bit-for-bit before rounding
    o["recrawl_priority"] = f"""
        WITH caps AS (
          SELECT {_EV_URL_SQL} AS url, ts, event_id,
                 md5(CAST(CAST(floor(value * 5) AS BIGINT) AS VARCHAR))
                   AS digest
          FROM events),
        lagd AS (
          SELECT url, ts, digest,
                 lag(digest) OVER (PARTITION BY url
                                   ORDER BY ts, event_id) AS prev,
                 row_number() OVER (PARTITION BY url
                                    ORDER BY ts, event_id) AS rn
          FROM caps),
        st AS (
          SELECT url, count(*) AS n_captures,
                 CAST(sum(CASE WHEN rn > 1
                               AND digest IS DISTINCT FROM prev
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
                 min(ts) AS first_ts, max(ts) AS last_ts
          FROM lagd GROUP BY url),
        rt AS (
          SELECT url, n_captures, n_changes, last_ts,
                 CASE WHEN n_captures > 1
                       AND (CAST(epoch_us(last_ts) AS DOUBLE)
                            - epoch_us(first_ts)) / 86400000000.0 > 0
                 THEN round(
                   -ln((CAST(n_captures - 1 AS DOUBLE) - n_changes + 0.5)
                       / (CAST(n_captures - 1 AS DOUBLE) + 0.5))
                   / (((CAST(epoch_us(last_ts) AS DOUBLE)
                        - epoch_us(first_ts)) / 86400000000.0)
                      / CAST(n_captures - 1 AS DOUBLE)), 6)
                 END AS change_rate_per_day
          FROM st)
        SELECT url, n_captures, n_changes, change_rate_per_day,
               round((CAST(epoch_us(TIMESTAMP '2024-02-01 00:00:00')
                           AS DOUBLE) - epoch_us(last_ts))
                     / 86400000000.0, 6) AS age_days,
               round(1 - exp(-coalesce(change_rate_per_day, 0.1)
                     * greatest((CAST(epoch_us(TIMESTAMP
                                 '2024-02-01 00:00:00') AS DOUBLE)
                                 - epoch_us(last_ts)) / 86400000000.0,
                                0.0)), 6) AS p_changed
        FROM rt
    """

    # doc_chunks: same start arithmetic over the whitespace word list;
    # DuckDB list slicing is 1-based inclusive like F.slice
    o["doc_chunks"] = """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS words
          FROM documents),
        n AS (
          SELECT doc_id, words, len(words) AS nw,
                 1 + CAST(ceil(greatest(nw - 16, 0) / 8.0) AS INTEGER)
                   AS n_windows
          FROM w WHERE len(words) > 0),
        ch AS (
          SELECT doc_id,
                 unnest(range(0, n_windows)) AS chunk_id,
                 words, nw
          FROM n)
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               len(words[chunk_id * 8 + 1 : chunk_id * 8 + 16])
                 AS n_tokens,
               array_to_string(
                 words[chunk_id * 8 + 1 : chunk_id * 8 + 16], ' ') AS chunk
        FROM ch
        WHERE len(words[chunk_id * 8 + 1 : chunk_id * 8 + 16]) >= 1
    """

    # benchmark_contamination: same distinct-3-gram streams; membership
    # via IN (the slim benchmark fingerprint set)
    o["benchmark_contamination"] = f"""
        WITH sh AS (SELECT doc_id, {sh_doc} AS sh FROM documents),
        bench AS (
          SELECT DISTINCT md5(g) AS fp
          FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 37 = 0)),
        grams AS (SELECT doc_id, unnest(sh) AS g FROM sh)
        SELECT doc_id, count(*) AS n_hits
        FROM grams
        WHERE md5(g) IN (SELECT fp FROM bench)
        GROUP BY doc_id
    """

    # decontaminate_strip: bench fps from the same 3-gram shingle CTE,
    # positioned 3-grams over the same tokenization, token i cut iff a
    # benchmark-matching window starts in [i-2, i], rebuild in order
    o["decontaminate_strip"] = f"""
        WITH base AS (
          SELECT doc_id, {toks_doc} AS t,
                 len({toks_doc}) AS n
          FROM documents),
        sh AS (SELECT doc_id, {sh_doc} AS sh FROM documents),
        bench AS (
          SELECT DISTINCT md5(g) AS fp
          FROM (SELECT unnest(sh) AS g FROM sh WHERE doc_id % 37 = 0)),
        h AS (
          SELECT doc_id, pos,
                 md5(array_to_string(t[pos:pos + 2], ' ')) AS gram
          FROM (SELECT doc_id, t,
                       unnest(range(1, n - 3 + 2)) AS pos
                FROM base WHERE n >= 3)),
        st AS (
          SELECT doc_id, pos FROM h
          WHERE gram IN (SELECT fp FROM bench)),
        tk AS (
          SELECT doc_id, unnest(range(1, n + 1)) AS i
          FROM base WHERE n > 0),
        kept AS (
          SELECT tk.doc_id, tk.i FROM tk
          WHERE NOT EXISTS (
            SELECT 1 FROM st
            WHERE st.doc_id = tk.doc_id
              AND st.pos BETWEEN tk.i - 2 AND tk.i)),
        rebuilt AS (
          SELECT k.doc_id,
                 string_agg(b.t[k.i], ' ' ORDER BY k.i) AS text,
                 count(*) AS n_kept
          FROM kept k JOIN base b USING (doc_id)
          GROUP BY k.doc_id)
        SELECT b.doc_id, coalesce(r.text, '') AS text,
               CAST(b.n AS BIGINT) AS n_tokens,
               CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
        FROM base b LEFT JOIN rebuilt r USING (doc_id)
    """

    # html_quality: the same markup regenerated, the same regex chain
    # replayed (RE2-portable patterns; DuckDB needs the explicit 'g'
    # flag where Spark's regexp_replace is global by default)
    o["html_quality"] = r"""
        WITH h AS (
          SELECT doc_id,
                 '<html><head><script type="text/javascript">var x = '
                 || '"IGNORED TEXT";</script><style>.c{color:red}</style>'
                 || '</head><body><nav>'
                 || repeat('<a href="/x">nav item</a>',
                           CAST(doc_id % 4 + 1 AS INT))
                 || '</nav><p>' || text
                 || '</p><a class="more">Read <b>more</b></a>'
                 || '</body></html>' AS s
          FROM documents),
        ns AS (
          SELECT doc_id, s,
                 regexp_replace(regexp_replace(s,
                   '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                   '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS n
          FROM h),
        vis AS (
          SELECT doc_id, s,
                 trim(regexp_replace(regexp_replace(n,
                   '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS v,
                 regexp_extract_all(n,
                   '(?is)<a\b[^>]*>(.*?)</a>', 1) AS an
          FROM ns),
        agg AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(s, '<[A-Za-z!/]'))
                   AS BIGINT) AS n_tags,
                 CAST(len(regexp_extract_all(s, '(?i)<a\b'))
                   AS BIGINT) AS n_links,
                 CAST(length(v) AS BIGINT) AS visible_len,
                 CAST(coalesce(list_sum(list_transform(an, x ->
                   length(trim(regexp_replace(regexp_replace(x,
                     '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))))), 0)
                   AS BIGINT) AS anchor_len
          FROM vis)
        SELECT doc_id, n_tags, n_links, visible_len, anchor_len,
               round(anchor_len / greatest(visible_len, 1), 4)
                 AS link_density,
               round(visible_len / greatest(n_tags, 1), 4)
                 AS text_tag_ratio
        FROM agg
    """

    # quality_buckets: the quality expression is quality_scores' oracle;
    # ntile ties broken identically
    o["quality_buckets"] = f"""
        WITH t AS (SELECT doc_id, lang, text, {toks_doc} AS toks
                   FROM documents),
        feats AS (
          SELECT doc_id, lang, len(toks) AS n_tokens,
                 round(len(regexp_extract_all(text, '{PUNCT_RE}'))
                       / greatest(length(text), 1), 4) AS punct_ratio,
                 {stop_ratio} AS stopword_ratio
          FROM t),
        scored AS (
          SELECT doc_id, lang,
                 round(0.4 * (CASE WHEN n_tokens >= 20 THEN 1.0
                                   ELSE n_tokens / 20.0 END)
                       + 0.4 * least(stopword_ratio * 2.5, 1.0)
                       + 0.2 * greatest(0.0, 1.0 - punct_ratio * 5.0), 4)
                   AS quality
          FROM feats)
        SELECT doc_id, lang, quality,
               CAST(ntile(3) OVER (PARTITION BY lang
                                   ORDER BY quality ASC, doc_id ASC)
                    AS INTEGER) AS bucket
        FROM scored
    """

    # sitemap_entries: expected rows from the construction arithmetic
    # (two blocks per doc; evens carry lastmod, non-multiples-of-3 carry
    # priority; changefreq case-folds; the q/ block is all-null)
    o["sitemap_entries"] = """
        WITH d AS (
          SELECT doc_id, source,
                 'https://' || source || '.org/sitemap/'
                 || CAST(doc_id AS VARCHAR) || '.xml' AS sitemap_url,
                 list_value('always', 'hourly', 'daily', 'weekly',
                            'monthly', 'yearly', 'never')
                   [CAST(doc_id % 7 AS INTEGER) + 1] AS freq
          FROM documents),
        p AS (
          SELECT sitemap_url,
                 'https://' || source || '.org/p/'
                 || CAST(doc_id AS VARCHAR) AS loc,
                 CASE WHEN doc_id % 2 = 0 THEN
                   '2024-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR)
                 END AS lastmod,
                 freq AS changefreq,
                 CASE WHEN doc_id % 3 <> 0 THEN
                   CAST('0.' || CAST(doc_id % 10 AS VARCHAR) AS DOUBLE)
                 END AS priority,
                 round(CASE freq
                   WHEN 'always' THEN 24.0 WHEN 'hourly' THEN 24.0
                   WHEN 'daily' THEN 1.0 WHEN 'weekly' THEN 1.0/7
                   WHEN 'monthly' THEN 1.0/30 WHEN 'yearly' THEN 1.0/365
                   WHEN 'never' THEN 0.0 END, 6) AS prior_rate_per_day
          FROM d),
        qq AS (
          SELECT sitemap_url,
                 'https://' || source || '.org/q/'
                 || CAST(doc_id AS VARCHAR) AS loc,
                 CAST(NULL AS VARCHAR) AS lastmod,
                 CAST(NULL AS VARCHAR) AS changefreq,
                 CAST(NULL AS DOUBLE) AS priority,
                 CAST(NULL AS DOUBLE) AS prior_rate_per_day
          FROM d)
        SELECT * FROM p UNION ALL SELECT * FROM qq
    """

    # surt_keys: same reverse-join / separator / lowering steps
    o["surt_keys"] = """
        SELECT doc_id,
               array_to_string(list_reverse(
                 string_split(regexp_replace(regexp_replace(
                   lower(netloc), '^www\\.', ''), ':[0-9]+$', ''), '.')),
                 ',')
               || ')' ||
               regexp_replace(lower(path), '/+$', '')
               || lower(query) AS surt
        FROM (
          SELECT doc_id,
                 regexp_extract(rest, '^([^/?#]*)', 1) AS netloc,
                 regexp_extract(rest, '^[^/?#]*([^?#]*)', 1) AS path,
                 regexp_extract(rest, '^[^#?]*(\\?[^#]*)', 1) AS query
          FROM (
            SELECT doc_id,
                   regexp_replace(
                     'https://www.' || source || '.org/Docs/'
                     || CAST(doc_id AS VARCHAR)
                     || CASE WHEN doc_id % 3 = 0 THEN '/'
                             WHEN doc_id % 3 = 1 THEN '?Ref=Feed'
                             ELSE '#frag' END,
                     '^[a-zA-Z][a-zA-Z0-9+.\\-]*://', '') AS rest
            FROM documents))
    """

    # char_entropy: same p*log2(p) fold over the distinct characters
    o["char_entropy"] = """
        SELECT doc_id,
               CASE WHEN len(chars) > 0 THEN
                 round(-list_reduce(
                   list_transform(list_distinct(chars),
                     c -> (CAST(len(list_filter(chars, x -> x = c))
                                AS DOUBLE) / len(chars))
                          * log2(CAST(len(list_filter(chars, x -> x = c))
                                      AS DOUBLE) / len(chars))),
                   (a, b) -> a + b), 6)
               END AS entropy
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ''), x -> x <> '')
                       AS chars
              FROM documents)
    """

    # boolean_search: docs containing ALL query terms (count-equals
    # over the distinct (doc, token) stream — posting semantics)
    o["boolean_search"] = f"""
        WITH dt AS (
          SELECT DISTINCT doc_id, token
          FROM (SELECT doc_id, unnest({toks_doc}) AS token
                FROM documents))
        SELECT doc_id FROM dt
        WHERE token IN ('join', 'hash', 'scan')
        GROUP BY doc_id HAVING count(*) = 3
    """

    # phrase_search: consecutive-window scan — equivalent to the
    # base-offset intersection by construction
    o["phrase_search"] = f"""
        WITH t AS (SELECT doc_id, {toks_doc} AS toks FROM documents),
        w AS (
          SELECT doc_id,
                 len(list_filter(range(1, len(toks) - 1),
                     i -> toks[i] = 'slow' AND toks[i + 1] = 'hash'
                          AND toks[i + 2] = 'batch')) AS n_matches
          FROM t WHERE len(toks) >= 3)
        SELECT doc_id, CAST(n_matches AS INTEGER) AS n_matches
        FROM w WHERE n_matches > 0
    """

    # proximity_search: positions of each term via list_filter over the
    # token array (1-based there, but gaps are position DIFFERENCES so
    # the off-by-one cancels), then the same existential set fold for
    # the fixed 3-term query — r1 = t1 positions reachable from t0,
    # r2 = t2 positions reachable from r1, n_matches = len(r2)
    o["proximity_search"] = f"""
        WITH t AS (SELECT doc_id, {toks_doc} AS toks FROM documents),
        pos AS (
          SELECT doc_id,
                 list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = 'slow') AS p0,
                 list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = 'hash') AS p1,
                 list_filter(range(1, len(toks) + 1),
                             i -> toks[i] = 'batch') AS p2
          FROM t),
        chain AS (
          SELECT doc_id,
                 list_filter(p2, x -> len(list_filter(
                   list_filter(p1, y -> len(list_filter(p0,
                     c -> y > c AND y <= c + 4)) > 0),
                   c -> x > c AND x <= c + 4)) > 0) AS r2
          FROM pos)
        SELECT doc_id, CAST(len(r2) AS INTEGER) AS n_matches
        FROM chain WHERE len(r2) > 0
    """

    # bm25_topk: identical BM25 arithmetic (constants written as the
    # python-evaluated doubles); the per-doc sum folds in token order
    # on both sides, and list_reduce's first-element start equals
    # Spark's 0.0 + x (exact under IEEE)
    o["bm25_topk"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        qt AS (SELECT doc_id, token FROM toksv
               WHERE token IN ('join', 'hash', 'scan')),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM qt GROUP BY doc_id, token),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        per AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(tf.tf AS DOUBLE) * 2.2
                    / (CAST(tf.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        folded AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM per GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM folded)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 15
    """
    # ql_topk: the Dirichlet decomposed form replayed term-for-term —
    # p_t = cf/|C| as doubles, per-term ln(1 + tf/(mu*p_t)) folded in
    # token order (list_reduce's first-element seed == Spark's 0.0+x),
    # plus the query constant and the -nq*ln(dl+mu) length term
    o["ql_topk"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        tot AS (SELECT sum(CAST(dl AS DOUBLE)) AS ctot FROM dlf),
        qt AS (SELECT doc_id, token FROM toksv
               WHERE token IN ('join', 'hash', 'scan')),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM qt GROUP BY doc_id, token),
        cf AS (SELECT token, sum(CAST(tf AS DOUBLE)) AS cf
               FROM tf GROUP BY token),
        qc AS (
          SELECT list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token,
                                                l := ln(1500.0 * cf / tot.ctot)))),
                     x -> x['l']),
                   (a, c) -> a + c) AS qc,
                 CAST(count(*) AS DOUBLE) AS nq
          FROM cf, tot),
        per AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + CAST(tf.tf AS DOUBLE)
                          / (1500.0 * cf.cf / tot.ctot)) AS s
          FROM tf JOIN cf USING (token), tot),
        sp AS (
          SELECT doc_id,
                 list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c) AS sp
          FROM per GROUP BY doc_id),
        scored AS (
          SELECT sp.doc_id,
                 round(sp.sp + qc.qc
                       - qc.nq * ln(CAST(dlf.dl AS DOUBLE) + 1500.0),
                       6) AS score
          FROM sp JOIN dlf USING (doc_id), qc),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM scored)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 15
    """

    # hybrid_rrf: bm25 top-20 (the bm25_topk chain, k=20) + cosine
    # top-20 neighbors of vec 7, fused 1/(60+rank) with the sum folded
    # in source order (src 0 = lexical, src 1 = dense)
    o["hybrid_rrf"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        qt AS (SELECT doc_id, token FROM toksv
               WHERE token IN ('join', 'hash', 'scan')),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM qt GROUP BY doc_id, token),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        per AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(tf.tf AS DOUBLE) * 2.2
                    / (CAST(tf.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        folded AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM per GROUP BY doc_id),
        lex AS (
          SELECT doc_id, rank FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC)
                     AS rank
            FROM folded) WHERE rank <= 20),
        c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sem AS (
          SELECT neighbor_id AS doc_id, rank FROM (
            SELECT n.vec_id AS neighbor_id,
                   row_number() OVER (
                     ORDER BY {_sql_cosine("q.v", "n.v")} DESC, n.vec_id)
                     AS rank
            FROM c q, c n WHERE q.vec_id = 7 AND n.vec_id <> q.vec_id)
          WHERE rank <= 20),
        contrib AS (
          SELECT doc_id, 0 AS src,
                 1.0 / (60.0 + CAST(rank AS DOUBLE)) AS cn FROM lex
          UNION ALL
          SELECT doc_id, 1 AS src,
                 1.0 / (60.0 + CAST(rank AS DOUBLE)) AS cn FROM sem),
        fused AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(src := src, cn := cn))),
                     x -> x['cn']),
                   (a, c) -> a + c), 6) AS score,
                 count(*) AS n_lists
          FROM contrib GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score, n_lists,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM fused)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank,
               CAST(n_lists AS INTEGER) AS n_lists
        FROM ranked WHERE rank <= 15
    """

    # fuzzy_terms: the symmetric-delete join replayed — identical
    # identity-augmented delete-1 key sets on both sides, Levenshtein
    # verification, (dist, freq desc, term) ranking
    o["fuzzy_terms"] = f"""
        WITH toksv AS (
          SELECT unnest({toks_doc}) AS term FROM documents),
        vocab AS (SELECT term, count(*) AS freq FROM toksv GROUP BY term),
        vkeys AS (
          SELECT DISTINCT term AS candidate, freq, k FROM (
            SELECT term, freq,
                   unnest(list_append(
                     list_transform(range(1, length(term) + 1),
                       i -> substr(term, 1, i - 1)
                            || substr(term, i + 1, length(term) - i)),
                     term)) AS k
            FROM vocab)),
        q AS (SELECT unnest(['joind', 'hsh', 'scann', 'tabel', 'qury',
                             'batch']) AS query_term),
        qkeys AS (
          SELECT DISTINCT query_term, k FROM (
            SELECT query_term,
                   unnest(list_append(
                     list_transform(range(1, length(query_term) + 1),
                       i -> substr(query_term, 1, i - 1)
                            || substr(query_term, i + 1,
                                      length(query_term) - i)),
                     query_term)) AS k
            FROM q)),
        pairs AS (
          SELECT DISTINCT query_term, candidate, freq
          FROM vkeys JOIN qkeys USING (k)),
        verified AS (
          SELECT query_term, candidate, freq,
                 levenshtein(query_term, candidate) AS dist
          FROM pairs
          WHERE levenshtein(query_term, candidate) <= 1),
        ranked AS (
          SELECT query_term, candidate, dist, freq,
                 row_number() OVER (
                   PARTITION BY query_term
                   ORDER BY dist, freq DESC, candidate) AS rank
          FROM verified)
        SELECT query_term, candidate, CAST(dist AS INTEGER) AS dist,
               freq, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """

    # rm_expansion: the RM1 chain replayed — the ql_topk CTEs for
    # ('join','hash') cut at 10, exp-shift weights with Z folded in
    # doc-id order, P(t|d)*w/Z contributions folded per term in doc-id
    # order, 6dp round, top 12 by (score desc, term asc)
    o["rm_expansion"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT d.doc_id, coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        tot AS (SELECT sum(CAST(dl AS DOUBLE)) AS ctot FROM dlf),
        qt AS (SELECT doc_id, token FROM toksv
               WHERE token IN ('join', 'hash')),
        tfq AS (SELECT doc_id, token, count(*) AS tf
                FROM qt GROUP BY doc_id, token),
        cfq AS (SELECT token, sum(CAST(tf AS DOUBLE)) AS cf
                FROM tfq GROUP BY token),
        qc AS (
          SELECT list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token,
                                                l := ln(1500.0 * cf / tot.ctot)))),
                     x -> x['l']),
                   (a, c) -> a + c) AS qc,
                 CAST(count(*) AS DOUBLE) AS nq
          FROM cfq, tot),
        per AS (
          SELECT tfq.doc_id, tfq.token,
                 ln(1.0 + CAST(tfq.tf AS DOUBLE)
                          / (1500.0 * cfq.cf / tot.ctot)) AS s
          FROM tfq JOIN cfq USING (token), tot),
        sp AS (
          SELECT doc_id,
                 list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c) AS sp
          FROM per GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score FROM (
            SELECT sp.doc_id,
                   round(sp.sp + qc.qc
                         - qc.nq * ln(CAST(dlf.dl AS DOUBLE) + 1500.0),
                         6) AS score,
                   row_number() OVER (
                     ORDER BY round(sp.sp + qc.qc
                       - qc.nq * ln(CAST(dlf.dl AS DOUBLE) + 1500.0), 6)
                       DESC, sp.doc_id ASC) AS rnk
            FROM sp JOIN dlf USING (doc_id), qc)
          WHERE rnk <= 10),
        mx AS (SELECT max(score) AS mx FROM ranked),
        w AS (SELECT doc_id, exp(score - mx.mx) AS w FROM ranked, mx),
        z AS (
          SELECT list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(doc_id := doc_id,
                                                w := w))),
                     x -> x['w']),
                   (a, c) -> a + c) AS z
          FROM w),
        fbtf AS (
          SELECT t.doc_id, t.token AS term, count(*) AS tf
          FROM toksv t JOIN ranked USING (doc_id)
          GROUP BY t.doc_id, t.token),
        contrib AS (
          SELECT fbtf.term,
                 struct_pack(
                   doc_id := fbtf.doc_id,
                   c := CAST(fbtf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE)
                        * w.w / z.z) AS r
          FROM fbtf JOIN dl USING (doc_id) JOIN w USING (doc_id), z),
        scored AS (
          SELECT term,
                 round(list_reduce(
                   list_transform(list_sort(list(r)), x -> x['c']),
                   (a, c) -> a + c), 6) AS score
          FROM contrib GROUP BY term),
        out AS (
          SELECT term, score,
                 row_number() OVER (ORDER BY score DESC, term ASC)
                   AS rank
          FROM scored)
        SELECT term, score, CAST(rank AS INTEGER) AS rank
        FROM out WHERE rank <= 12
    """

    # kwic_snippets: first-hit anchored width-8 window, before = 4;
    # 1-based positions throughout on the SQL side (Spark's 0-based
    # first + 1 == DuckDB's list index)
    o["kwic_snippets"] = f"""
        WITH t AS (SELECT doc_id, {toks_doc} AS toks FROM documents),
        m AS (
          SELECT doc_id, toks,
                 list_filter(
                   list_transform(range(1, len(toks) + 1),
                     i -> struct_pack(i := i, tk := toks[i])),
                   s -> list_contains(['hash', 'join'], s.tk)) AS hits
          FROM t),
        hit AS (
          SELECT doc_id, toks, hits[1].i AS fp,
                 greatest(1, hits[1].i - 4) AS s1
          FROM m WHERE len(hits) > 0)
        SELECT doc_id, CAST(fp AS INTEGER) AS first_pos,
               array_to_string(toks[s1 : s1 + 7], ' ') AS snippet,
               CAST(len(list_filter(toks[s1 : s1 + 7],
                 x -> list_contains(['hash', 'join'], x)))
                 AS INTEGER) AS n_hits
        FROM hit
    """

    # bm25f_topk: the BM25F arithmetic replayed — title = first 8
    # tokens at weight 3.0, body = full text at weight 1.0; weighted
    # tf/dl folded in fixed field order (3.0*title + 1.0*body), then
    # the bm25_topk scoring over the weighted quantities
    o["bm25f_topk"] = f"""
        WITH base AS (
          SELECT doc_id, {toks_doc} AS bt, ({toks_doc})[1:8] AS tt
          FROM documents),
        dlw AS (
          SELECT doc_id,
                 3.0 * CAST(len(tt) AS DOUBLE)
                 + 1.0 * CAST(len(bt) AS DOUBLE) AS dl
          FROM base),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl
              FROM dlw),
        stream AS (
          SELECT doc_id, unnest(tt) AS token, 0 AS fi FROM base
          UNION ALL
          SELECT doc_id, unnest(bt) AS token, 1 AS fi FROM base),
        cnt AS (
          SELECT doc_id, token,
                 sum(CASE WHEN fi = 0 THEN 1 ELSE 0 END) AS c0,
                 sum(CASE WHEN fi = 1 THEN 1 ELSE 0 END) AS c1
          FROM stream WHERE token IN ('join', 'hash', 'scan')
          GROUP BY doc_id, token),
        tfw AS (
          SELECT doc_id, token,
                 CAST(c0 AS DOUBLE) * 3.0 + CAST(c1 AS DOUBLE) * 1.0
                   AS tf
          FROM cnt),
        dfq AS (SELECT token, count(*) AS df FROM tfw GROUP BY token),
        per AS (
          SELECT tfw.doc_id, tfw.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (tfw.tf * 2.2
                    / (tfw.tf
                       + 1.2 * (1.0 - 0.75 + 0.75 * dlw.dl / g.avgdl)))
                   AS s
          FROM tfw JOIN dfq USING (token) JOIN dlw USING (doc_id), g),
        folded AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM per GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM folded)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 15
    """

    # champion_search: per-term tf-top-32 pruning (row_number over the
    # token partition, ties on doc_id — the salted two-stage collapses
    # to exactly this), TRUE df from the pre-pruning counts, then the
    # bm25_topk arithmetic over the survivors
    o["champion_search"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        tfx AS (SELECT doc_id, token, count(*) AS tf
                FROM toksv WHERE token IN ('join', 'hash', 'scan')
                GROUP BY doc_id, token),
        dfq AS (SELECT token, count(*) AS df FROM tfx GROUP BY token),
        champ AS (
          SELECT doc_id, token, tf FROM (
            SELECT doc_id, token, tf,
                   row_number() OVER (
                     PARTITION BY token
                     ORDER BY tf DESC, doc_id ASC) AS rn
            FROM tfx)
          WHERE rn <= 32),
        per AS (
          SELECT champ.doc_id, champ.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(champ.tf AS DOUBLE) * 2.2
                    / (CAST(champ.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM champ JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        folded AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM per GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM folded)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 15
    """

    # kcore_hosts: the bounded-round peel unrolled CTE-for-CTE —
    # symmetrized distinct host edges, then 8 rounds of (degree ->
    # alive >= k -> both-endpoint restriction), final deg >= k cut.
    # Peeling is confluent, and rounds after convergence are no-ops,
    # so the unroll count only needs to MATCH the operator's bound.
    _kcore_k, _kcore_rounds = 9, 8
    _kc = """
        WITH d AS (SELECT doc_id FROM documents),
        raw AS (
          SELECT doc_id % 97 AS a, (doc_id * doc_id + 1) % 97 AS b
          FROM d
          UNION ALL
          SELECT doc_id % 97 AS a, (doc_id * 17 + 3) % 41 AS b FROM d),
        e0 AS MATERIALIZED (
          SELECT DISTINCT a, b FROM (
            SELECT a, b FROM raw WHERE a <> b
            UNION ALL
            SELECT b AS a, a AS b FROM raw WHERE a <> b))"""
    for _r in range(_kcore_rounds):
        _kc += f""",
        al{_r} AS MATERIALIZED (SELECT a FROM e{_r} GROUP BY a
                   HAVING count(*) >= {_kcore_k}),
        e{_r + 1} AS MATERIALIZED (
          SELECT e.a, e.b FROM e{_r} e
          JOIN al{_r} x ON e.a = x.a
          JOIN al{_r} y ON e.b = y.a)"""
    _kc += f"""
        SELECT a AS node, count(*) AS deg
        FROM e{_kcore_rounds} GROUP BY a
        HAVING count(*) >= {_kcore_k}
    """
    o["kcore_hosts"] = _kc

    # cocitation_hosts: distinct citations -> hub cut at out-degree 8
    # -> per-source pair self-join (a < b) -> cosine normalization by
    # the eligible-set citing counts, min 2 co-citing sources
    o["cocitation_hosts"] = """
        WITH e AS (
          SELECT DISTINCT src, dst FROM (
            SELECT doc_id AS src, (doc_id * doc_id + 1) % 97 AS dst
            FROM documents
            UNION ALL
            SELECT doc_id AS src, (doc_id * 17 + 3) % 41 AS dst
            FROM documents)),
        od AS (SELECT src FROM e GROUP BY src HAVING count(*) <= 8),
        el AS (SELECT e.src, e.dst FROM e JOIN od USING (src)),
        dfq AS (SELECT dst, count(*) AS df FROM el GROUP BY dst),
        pairs AS (
          SELECT l.dst AS a, r.dst AS b, count(*) AS n_common
          FROM el l JOIN el r ON l.src = r.src AND l.dst < r.dst
          GROUP BY l.dst, r.dst
          HAVING count(*) >= 2)
        SELECT p.a, p.b, p.n_common,
               round(CAST(p.n_common AS DOUBLE)
                     / sqrt(CAST(da.df AS DOUBLE)
                            * CAST(db.df AS DOUBLE)), 6) AS similarity
        FROM pairs p
        JOIN dfq da ON p.a = da.dst
        JOIN dfq db ON p.b = db.dst
    """

    # corrected_search: the fuzzy_terms correction chain cut at rank 1
    # feeding the bm25_topk arithmetic — token membership comes from
    # the corrections CTE instead of a literal list
    o["corrected_search"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        vocab AS (SELECT token AS term, count(*) AS freq
                  FROM toksv GROUP BY token),
        vkeys AS (
          SELECT DISTINCT term AS candidate, freq, k FROM (
            SELECT term, freq,
                   unnest(list_append(
                     list_transform(range(1, length(term) + 1),
                       i -> substr(term, 1, i - 1)
                            || substr(term, i + 1, length(term) - i)),
                     term)) AS k
            FROM vocab)),
        q AS (SELECT unnest(['joind', 'hsh', 'scann']) AS query_term),
        qkeys AS (
          SELECT DISTINCT query_term, k FROM (
            SELECT query_term,
                   unnest(list_append(
                     list_transform(range(1, length(query_term) + 1),
                       i -> substr(query_term, 1, i - 1)
                            || substr(query_term, i + 1,
                                      length(query_term) - i)),
                     query_term)) AS k
            FROM q)),
        cpairs AS (
          SELECT DISTINCT query_term, candidate, freq
          FROM vkeys JOIN qkeys USING (k)),
        corr AS (
          SELECT DISTINCT candidate AS ctoken FROM (
            SELECT query_term, candidate,
                   row_number() OVER (
                     PARTITION BY query_term
                     ORDER BY levenshtein(query_term, candidate),
                              freq DESC, candidate) AS rnk
            FROM cpairs
            WHERE levenshtein(query_term, candidate) <= 1)
          WHERE rnk = 1),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM toksv
               WHERE token IN (SELECT ctoken FROM corr)
               GROUP BY doc_id, token),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        per AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(tf.tf AS DOUBLE) * 2.2
                    / (CAST(tf.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        folded AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM per GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM folded)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 15
    """

    # champion_recall: full-index top-15 CTE vs champion(m=8) top-15
    # CTE, overlap counted on the doc id — both replays of the audited
    # bm25 arithmetic over the same shared token stream
    o["champion_recall"] = f"""
        WITH toksv AS MATERIALIZED (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        dl AS MATERIALIZED (
          SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS MATERIALIZED (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        tfx AS MATERIALIZED (
          SELECT doc_id, token, count(*) AS tf
          FROM toksv WHERE token IN ('join', 'hash', 'scan')
          GROUP BY doc_id, token),
        dfq AS MATERIALIZED (
          SELECT token, count(*) AS df FROM tfx GROUP BY token),
        perf AS (
          SELECT tfx.doc_id, tfx.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(tfx.tf AS DOUBLE) * 2.2
                    / (CAST(tfx.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM tfx JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        fullr AS MATERIALIZED (
          SELECT doc_id FROM (
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY round(list_reduce(
                       list_transform(
                         list_sort(list(struct_pack(token := token,
                                                    s := s))),
                         x -> x['s']),
                       (a, c) -> a + c), 6) DESC, doc_id ASC) AS rnk
            FROM perf GROUP BY doc_id)
          WHERE rnk <= 15),
        champ AS (
          SELECT doc_id, token, tf FROM (
            SELECT doc_id, token, tf,
                   row_number() OVER (
                     PARTITION BY token
                     ORDER BY tf DESC, doc_id ASC) AS rn
            FROM tfx)
          WHERE rn <= 8),
        perc AS (
          SELECT champ.doc_id, champ.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(champ.tf AS DOUBLE) * 2.2
                    / (CAST(champ.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM champ JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        prunedr AS MATERIALIZED (
          SELECT doc_id FROM (
            SELECT doc_id,
                   row_number() OVER (
                     ORDER BY round(list_reduce(
                       list_transform(
                         list_sort(list(struct_pack(token := token,
                                                    s := s))),
                         x -> x['s']),
                       (a, c) -> a + c), 6) DESC, doc_id ASC) AS rnk
            FROM perc GROUP BY doc_id)
          WHERE rnk <= 15)
        SELECT 15 AS k, 8 AS m,
               count(*) AS n_common,
               round(count(*) / 15.0, 6) AS recall_at_k
        FROM prunedr JOIN fullr USING (doc_id)
    """

    # fuzzy_contamination: the near_dedup_incremental machinery with
    # corpus/benchmark roles — synthetic eval set = every 41st doc
    # truncated to 4/5 chars, LSH band collision -> signature-agreement
    # estimate >= 0.5 -> per-doc hit aggregate (NO self-exclusion:
    # byte-identical leakage is exactly what must flag)
    _csig_eq = " + ".join(
        f"CAST(cs.s{j} = bs.s{j} AS INT)" for j in range(NUM_HASHES))
    o["fuzzy_contamination"] = f"""
        WITH bench AS (
          SELECT doc_id, substr(text, 1, (n_chars * 4) // 5) AS text
          FROM documents WHERE doc_id % 41 = 0),
        cbase AS (SELECT doc_id, {sh_doc} AS sh FROM documents),
        bbase AS (SELECT doc_id, {sh_doc} AS sh FROM bench),
        csigs AS MATERIALIZED (
          SELECT doc_id, {_sql_minhash_sigs()} FROM cbase),
        bsigs AS MATERIALIZED (
          SELECT doc_id, {_sql_minhash_sigs()} FROM bbase),
        cbk AS ({_band_rows_from("csigs")}),
        bbk AS ({_band_rows_from("bsigs")}),
        cand AS (
          SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bid
          FROM cbk c JOIN bbk b
            ON c.band = b.band AND c.bucket = b.bucket),
        est AS (
          SELECT cand.cid, cand.bid,
                 round(CAST({_csig_eq} AS DOUBLE) / {NUM_HASHES}, 6)
                   AS est
          FROM cand
          JOIN csigs cs ON cs.doc_id = cand.cid
          JOIN bsigs bs ON bs.doc_id = cand.bid)
        SELECT cid AS doc_id, count(*) AS n_bench_matches,
               max(est) AS max_est_jaccard
        FROM est WHERE est >= 0.5 GROUP BY cid
    """

    # mmr_diversify: the greedy MMR trace unrolled CTE-for-CTE — k=8
    # steps, each replaying the operator's exact expression: remaining
    # = not-yet-selected, marginal = round(0.75*rel - 0.25*max_cos, 6)
    # with IEEE -0.0 folded by + 0.0, argmax via struct sort on
    # (-marginal, id), CASE no-op once candidates exhaust
    _mmr_cos = (
        "round("
        + _SQL_DOT.format(a="c['vec']", b="s['vec']")
        + " / (sqrt(" + _SQL_DOT.format(a="c['vec']", b="c['vec']")
        + ") * sqrt(" + _SQL_DOT.format(a="s['vec']", b="s['vec']")
        + ")), 6)"
    )
    _mmr_step = f"""
          SELECT cands,
            CASE WHEN len(rem) = 0 THEN sel
                 ELSE list_append(sel, struct_pack(
                   id := best['id'],
                   score := -best['nm'] + 0.0,
                   vec := list_filter(cands,
                            c -> c['id'] = best['id'])[1]['vec']))
            END AS sel
          FROM (
            SELECT cands, sel, rem,
                   list_sort(list_transform(rem, c -> struct_pack(
                     nm := -round(0.75 * c['rel'] - 0.25 * coalesce(
                       list_max(list_transform(sel, s -> {_mmr_cos})),
                       0.0), 6) + 0.0,
                     id := c['id'])))[1] AS best
            FROM (
              SELECT cands, sel,
                     list_filter(cands, c -> NOT list_contains(
                       list_transform(sel, s -> s['id']), c['id']))
                       AS rem
              FROM {{prev}}))"""
    _mmr = """
        WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v
                    FROM embeddings),
        q0 AS (SELECT v FROM ev WHERE vec_id = 0),
        cand AS (
          SELECT vec_id, rel, v FROM (
            SELECT e.vec_id, {cosq} AS rel, e.v,
                   row_number() OVER (
                     ORDER BY {cosq} DESC, e.vec_id) AS rnk
            FROM ev e, q0 WHERE e.vec_id <> 0)
          WHERE rnk <= 20),
        m0 AS MATERIALIZED (
          SELECT list_sort(list(struct_pack(id := vec_id, rel := rel,
                                            vec := v))) AS cands,
                 CAST([] AS STRUCT(id BIGINT, score DOUBLE,
                                   vec DOUBLE[])[]) AS sel
          FROM cand)""".format(
        cosq="round(" + _SQL_DOT.format(a="e.v", b="q0.v")
        + " / (sqrt(" + _SQL_DOT.format(a="e.v", b="e.v")
        + ") * sqrt(" + _SQL_DOT.format(a="q0.v", b="q0.v") + ")), 6)")
    for _i in range(1, 9):
        _mmr += f",\n        m{_i} AS MATERIALIZED ({_mmr_step.format(prev=f'm{_i - 1}')})"
    _mmr += """
        SELECT r['s']['id'] AS vec_id,
               r['s']['score'] AS mmr_score,
               CAST(r['i'] AS INTEGER) AS rank
        FROM (
          SELECT unnest(list_transform(range(1, len(sel) + 1),
                   i -> struct_pack(i := i, s := sel[i]))) AS r
          FROM m8)
    """
    o["mmr_diversify"] = _mmr

    # pii_cards: the same planting, the same candidate regex, and the
    # Luhn fold replayed in list lambdas (integer sum — order-free)
    _luhn_sql = (
        "list_reduce(list_transform(range(1, length(c) + 1), i -> "
        "CASE WHEN (length(c) - i) % 2 = 1 THEN "
        "CASE WHEN CAST(substr(c, i, 1) AS INT) * 2 > 9 "
        "THEN CAST(substr(c, i, 1) AS INT) * 2 - 9 "
        "ELSE CAST(substr(c, i, 1) AS INT) * 2 END "
        "ELSE CAST(substr(c, i, 1) AS INT) END), "
        "(a, b) -> a + b) % 10 = 0"
    )
    o["pii_cards"] = f"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 29 = 0 THEN text ||
                        ' card 4532015112830366 and ref 1234567890123'
                      WHEN doc_id % 31 = 0 THEN text ||
                        ' pay 4111-1111-1111-1111 now'
                      ELSE text END AS t
          FROM documents),
        cands AS (
          SELECT doc_id,
                 list_transform(
                   regexp_extract_all(
                     t, '\\b(?:[0-9][ \\-]?){{12,18}}[0-9]\\b'),
                   x -> regexp_replace(x, '[ \\-]', '', 'g')) AS cs
          FROM planted)
        SELECT doc_id,
               CAST(len(cs) AS INTEGER) AS n_card_candidates,
               CAST(len(list_filter(cs, c -> {_luhn_sql}))
                 AS INTEGER) AS n_cards_valid
        FROM cands WHERE len(cs) > 0
    """

    # anchor_bm25: the anchor field rebuilt with string_agg (sorted,
    # space-joined = the operator's array_sort + concat_ws), then the
    # bm25_topk arithmetic over the derived 50-doc corpus
    o["anchor_bm25"] = f"""
        WITH links AS (
          SELECT (doc_id * doc_id + 7) % 50 AS target,
                 ['fast spark join', 'hash index scan',
                  'news archive feed', 'deep join scan'][doc_id % 4 + 1]
                   AS anchor
          FROM documents),
        afield AS (
          SELECT target AS doc_id,
                 string_agg(anchor, ' ' ORDER BY anchor) AS text
          FROM links GROUP BY target),
        toksv AS (
          SELECT doc_id, unnest({_SQL_TOKS.format(t="text")}) AS token
          FROM afield),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM afield d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        qt AS (SELECT doc_id, token FROM toksv
               WHERE token IN ('join', 'scan')),
        tf AS (SELECT doc_id, token, count(*) AS tf
               FROM qt GROUP BY doc_id, token),
        dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        per AS (
          SELECT tf.doc_id, tf.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(tf.tf AS DOUBLE) * 2.2
                    / (CAST(tf.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM tf JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        folded AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM per GROUP BY doc_id),
        ranked AS (
          SELECT doc_id, score,
                 row_number() OVER (ORDER BY score DESC, doc_id ASC)
                   AS rank
          FROM folded)
        SELECT doc_id, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 10
    """

    # the indexed twins compute identical results from the persisted
    # index, so the end-to-end oracles are the same SQL
    o["bm25_indexed"] = o["bm25_topk"]
    o["phrase_indexed"] = o["phrase_search"]
    # bm25_tombstoned: exact-stat deletes == a fresh index of the
    # survivors, so the oracle IS bm25_topk over the live subset
    o["bm25_tombstoned"] = o["bm25_topk"].replace(
        "FROM documents",
        "FROM (SELECT * FROM documents WHERE doc_id % 7 <> 0)")

    # split_assign: the shard_assign hash family at modulus 100
    o["split_assign"] = """
        SELECT doc_id,
               CASE WHEN b < 90 THEN 'train'
                    WHEN b < 95 THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       ::BIGINT % 100 AS b
              FROM documents)
    """

    # link_locality_stats: per doc the construction yields 1 external
    # (ext.test) + 1 internal (/s/) + (doc_id even ? 1 internal : 0)
    o["link_locality_stats"] = """
        WITH d AS (
          SELECT source || '.news.test' AS host,
                 2 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                   AS edges,
                 1 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                   AS internal
          FROM documents)
        SELECT host,
               CAST(sum(edges) AS BIGINT) AS n_edges,
               CAST(sum(internal) AS BIGINT) AS n_internal,
               CAST(sum(edges) - sum(internal) AS BIGINT) AS n_external,
               round(CAST(sum(internal) AS DOUBLE)
                     / CAST(sum(edges) AS DOUBLE), 6) AS internal_ratio
        FROM d GROUP BY host
    """

    # anchor_texts: expected (target, anchor) multiset from the same
    # doc_id arithmetic the query used to build the pages
    o["anchor_texts"] = """
        WITH d AS (
          SELECT doc_id, source, lang,
                 CAST(doc_id % 50 AS VARCHAR) AS m50,
                 CAST(doc_id % 7 AS VARCHAR) AS m7,
                 doc_id % 2 AS m2
          FROM documents),
        pairs AS (
          SELECT 'https://ext.test/p/' || m50 AS abs_url,
                 'page ' || m50 AS anchor FROM d
          UNION ALL
          SELECT 'https://ext.test/p/' || m50,
                 CASE WHEN m2 = 0 THEN 'click here'
                      ELSE 'page ' || m50 END FROM d
          UNION ALL
          SELECT 'https://' || source || '.news.test/s/' || m7,
                 's' || m7 FROM d),
        counts AS (
          SELECT abs_url, anchor, count(*) AS c
          FROM pairs GROUP BY abs_url, anchor),
        agg AS (
          SELECT abs_url, CAST(sum(c) AS BIGINT) AS n_anchors,
                 count(*) AS n_unique
          FROM counts GROUP BY abs_url),
        top AS (
          SELECT abs_url, anchor AS top_anchor,
                 CAST(c AS BIGINT) AS top_count
          FROM (SELECT *, row_number() OVER (
                  PARTITION BY abs_url
                  ORDER BY c DESC, anchor DESC) AS rn
                FROM counts)
          WHERE rn = 1)
        SELECT a.abs_url, a.n_anchors, a.n_unique,
               t.top_anchor, t.top_count
        FROM agg a JOIN top t USING (abs_url)
    """

    # tfidf_terms: identical tf / df / N arithmetic; row_number ties by
    # (score desc, token asc) on both sides
    o["tfidf_terms"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        tf AS (
          SELECT doc_id, token, count(*) AS tf
          FROM toksv GROUP BY doc_id, token),
        dfreq AS (
          SELECT token, count(*) AS df
          FROM (SELECT DISTINCT doc_id, token FROM toksv)
          GROUP BY token),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.token,
                 round(CAST(tf.tf AS DOUBLE)
                       * ln(n.n_docs / CAST(d.df AS DOUBLE)), 6) AS score
          FROM tf JOIN dfreq d USING (token), n),
        ranked AS (
          SELECT doc_id, token, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, token ASC) AS rank
          FROM scored)
        SELECT doc_id, token, score, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3
    """

    # training_export_pipeline: the lm_quality, contamination, chunking
    # and shard expressions composed as CTEs — each identical to its
    # standalone oracle
    o["training_export_pipeline"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        counts AS (
          SELECT token, count(*) AS cnt FROM toksv GROUP BY token),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM counts),
        scored AS (
          SELECT t.doc_id,
                 round(avg(ln(CAST(c.cnt AS DOUBLE) / tot.total)), 6)
                   AS avg_logprob
          FROM toksv t JOIN counts c USING (token), tot
          GROUP BY t.doc_id),
        keepers AS (
          SELECT doc_id FROM scored WHERE avg_logprob >= -3.405),
        shv AS (SELECT doc_id, {sh_doc} AS sh FROM documents),
        benchg AS (
          SELECT DISTINCT md5(g) AS fp
          FROM (SELECT unnest(sh) AS g FROM shv WHERE doc_id % 37 = 0)),
        contaminated AS (
          SELECT DISTINCT doc_id
          FROM (SELECT doc_id, unnest(sh) AS g FROM shv)
          WHERE md5(g) IN (SELECT fp FROM benchg)),
        clean AS (
          SELECT d.doc_id, d.text FROM documents d
          SEMI JOIN keepers USING (doc_id)
          ANTI JOIN contaminated USING (doc_id)),
        w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS words
          FROM clean),
        n AS (
          SELECT doc_id, words, len(words) AS nw,
                 1 + CAST(ceil(greatest(nw - 16, 0) / 8.0) AS INTEGER)
                   AS n_windows
          FROM w WHERE len(words) > 0),
        ch AS (
          SELECT doc_id, unnest(range(0, n_windows)) AS chunk_id, words
          FROM n)
        SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
               len(words[chunk_id * 8 + 1 : chunk_id * 8 + 16])
                 AS n_tokens,
               CAST((('0x' || substring(md5(
                     CAST(doc_id AS VARCHAR) || '#'
                     || CAST(chunk_id AS VARCHAR)), 1, 8))::BIGINT % 16)
                    AS INTEGER) AS shard
        FROM ch
        WHERE len(words[chunk_id * 8 + 1 : chunk_id * 8 + 16]) >= 1
    """

    # shard_assign: the same md5-hex-prefix modulus
    o["shard_assign"] = """
        SELECT doc_id,
               CAST((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                     ::BIGINT % 64) AS INTEGER) AS shard
        FROM documents
    """

    # bigram_topk: same zipped pair stream as lm_bigram's oracle
    o["bigram_topk"] = f"""
        WITH toks AS (
          SELECT doc_id, {toks_doc} AS t FROM documents),
        bg AS (
          SELECT unnest(t[1:len(t) - 1]) AS w1,
                 unnest(t[2:len(t)]) AS w2
          FROM toks WHERE len(t) >= 2)
        SELECT w1, w2, count(*) AS cnt
        FROM bg GROUP BY w1, w2
        ORDER BY cnt DESC, w1 ASC, w2 ASC
        LIMIT 20
    """

    # length_histogram: identical bucket arithmetic
    o["length_histogram"] = """
        SELECT bucket, count(*) AS n_docs FROM (
          SELECT CASE WHEN nt <= 0 THEN -1
                      ELSE CAST(floor(log2(CAST(nt AS DOUBLE))) AS INTEGER)
                 END AS bucket
          FROM (SELECT len(list_filter(string_split_regex(text, '\\s+'),
                                       x -> x <> '')) AS nt
                FROM documents))
        GROUP BY bucket
    """

    # language_mix: the per-line language CASE inlined into a DuckDB
    # list_transform lambda (no locals in lambdas, so hits repeat)
    _toks_l = _SQL_TOKS.format(t="l")
    _en_l = _sql_stop_hits(_toks_l, "en")
    _de_l = _sql_stop_hits(_toks_l, "de")
    _fr_l = _sql_stop_hits(_toks_l, "fr")
    _lang_l = f"""CASE
        WHEN greatest({_en_l}, {_de_l}, {_fr_l}) = 0 THEN 'und'
        WHEN {_en_l} = greatest({_en_l}, {_de_l}, {_fr_l}) THEN 'en'
        WHEN {_de_l} = greatest({_en_l}, {_de_l}, {_fr_l}) THEN 'de'
        ELSE 'fr' END"""
    o["language_mix"] = f"""
        WITH m AS (
          SELECT doc_id,
            concat_ws(chr(10), text,
              'the and of to in that',
              CASE WHEN doc_id % 3 = 0 THEN 'der und die das ist von'
                   ELSE 'the and of to in that' END,
              CASE WHEN doc_id % 5 = 0 THEN 'le la les et de des'
                   ELSE 'plain tail line' END) AS mtext
          FROM documents),
        p AS (
          SELECT doc_id,
                 list_transform(
                   list_filter(list_transform(string_split(mtext, chr(10)),
                                              x -> trim(x)),
                               x -> x <> ''),
                   l -> {_lang_l}) AS preds
          FROM m),
        c AS (
          SELECT doc_id, len(preds) AS n_lines,
                 len(list_filter(preds, x -> x = 'en')) AS en_c,
                 len(list_filter(preds, x -> x = 'de')) AS de_c,
                 len(list_filter(preds, x -> x = 'fr')) AS fr_c,
                 len(list_filter(preds, x -> x = 'und')) AS und_c
          FROM p)
        SELECT doc_id, n_lines,
               CAST((CASE WHEN en_c > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN de_c > 0 THEN 1 ELSE 0 END)
                    + (CASE WHEN fr_c > 0 THEN 1 ELSE 0 END)
                    AS INTEGER) AS n_langs,
               CASE WHEN n_lines = 0 THEN NULL
                    WHEN en_c = greatest(en_c, de_c, fr_c, und_c)
                         AND en_c > 0 THEN 'en'
                    WHEN de_c = greatest(en_c, de_c, fr_c, und_c)
                         AND de_c > 0 THEN 'de'
                    WHEN fr_c = greatest(en_c, de_c, fr_c, und_c)
                         AND fr_c > 0 THEN 'fr'
                    ELSE 'und' END AS dominant_lang,
               CASE WHEN n_lines = 0 THEN NULL
                    ELSE (CASE WHEN en_c > 0 THEN 1 ELSE 0 END)
                         + (CASE WHEN de_c > 0 THEN 1 ELSE 0 END)
                         + (CASE WHEN fr_c > 0 THEN 1 ELSE 0 END) >= 2
               END AS mixed
        FROM c
    """

    # corpus_report: the same per-doc expressions, one global aggregate
    o["corpus_report"] = f"""
        WITH t AS (SELECT doc_id, text, {toks_doc} AS toks
                   FROM documents),
        feats AS (
          SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ',
                                         'g'))) AS fp,
                 len(toks) AS n_tokens,
                 len(list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '')) AS nt,
                 length(text) AS nc,
                 round(len(regexp_extract_all(text, '{PUNCT_RE}'))
                       / greatest(length(text), 1), 4) AS punct_ratio,
                 {stop_ratio} AS stopword_ratio,
                 {en} AS en_h, {de} AS de_h, {fr} AS fr_h
          FROM t),
        scored AS (
          SELECT fp, nt, nc,
                 round(0.4 * (CASE WHEN n_tokens >= 20 THEN 1.0
                                   ELSE n_tokens / 20.0 END)
                       + 0.4 * least(stopword_ratio * 2.5, 1.0)
                       + 0.2 * greatest(0.0, 1.0 - punct_ratio * 5.0), 4)
                   AS q,
                 CASE WHEN greatest(en_h, de_h, fr_h) = 0 THEN 'und'
                      WHEN en_h = greatest(en_h, de_h, fr_h) THEN 'en'
                      WHEN de_h = greatest(en_h, de_h, fr_h) THEN 'de'
                      ELSE 'fr' END AS lang
          FROM feats)
        SELECT count(*) AS n_docs,
               count(DISTINCT fp) AS n_unique_docs,
               CAST(sum(nt) AS BIGINT) AS total_tokens,
               CAST(sum(nc) AS BIGINT) AS total_chars,
               round(avg(q), 4) AS mean_quality,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_en,
               CAST(sum(CASE WHEN lang = 'und' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_und
        FROM scored
    """

    # host_stats: per-doc language/quality/token expressions (identical
    # to the language_id / quality_scores / token_counts oracles) then
    # one GROUP BY host
    o["host_stats"] = f"""
        WITH t AS (
          SELECT 'www.' || source || '.org' AS host, text,
                 {toks_doc} AS toks
          FROM documents),
        feats AS (
          SELECT host,
                 len(list_filter(string_split_regex(text, '\\s+'),
                                 x -> x <> '')) AS nt,
                 round(len(regexp_extract_all(text, '{PUNCT_RE}'))
                       / greatest(length(text), 1), 4) AS punct_ratio,
                 {stop_ratio} AS stopword_ratio,
                 len(toks) AS n_tokens,
                 {en} AS en_h, {de} AS de_h, {fr} AS fr_h
          FROM t),
        scored AS (
          SELECT host, nt,
                 round(0.4 * (CASE WHEN n_tokens >= 20 THEN 1.0
                                   ELSE n_tokens / 20.0 END)
                       + 0.4 * least(stopword_ratio * 2.5, 1.0)
                       + 0.2 * greatest(0.0, 1.0 - punct_ratio * 5.0), 4)
                   AS q,
                 CASE WHEN greatest(en_h, de_h, fr_h) = 0 THEN 'und'
                      WHEN en_h = greatest(en_h, de_h, fr_h) THEN 'en'
                      WHEN de_h = greatest(en_h, de_h, fr_h) THEN 'de'
                      ELSE 'fr' END AS lang
          FROM feats)
        SELECT host, count(*) AS n_docs,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_en,
               CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_de,
               CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_fr,
               CAST(sum(CASE WHEN lang = 'und' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_und,
               round(avg(q), 4) AS mean_quality,
               round(avg(CAST(nt AS DOUBLE)), 4) AS mean_tokens
        FROM scored GROUP BY host
    """

    # mirror_overlap: distinct (host, fp) -> capped fp self-join ->
    # containment; fp = md5 of the leading 3-token shingle
    o["mirror_overlap"] = f"""
        WITH hf AS (
          SELECT DISTINCT 'www.' || source || '.org' AS host,
                 md5(array_to_string(({toks_doc})[1:3], ' ')) AS fp
          FROM documents),
        tot AS (SELECT host, count(*) AS n FROM hf GROUP BY host),
        rare AS (SELECT fp FROM hf GROUP BY fp HAVING count(*) <= 50),
        hf2 AS (SELECT hf.* FROM hf SEMI JOIN rare USING (fp)),
        pairs AS (
          SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
          FROM hf2 a JOIN hf2 b USING (fp)
          WHERE a.host < b.host
          GROUP BY 1, 2)
        SELECT host_a, host_b, shared, ta.n AS n_a, tb.n AS n_b,
               round(shared / CAST(least(ta.n, tb.n) AS DOUBLE), 6)
                 AS overlap
        FROM pairs
        JOIN tot ta ON ta.host = pairs.host_a
        JOIN tot tb ON tb.host = pairs.host_b
    """

    # soft404_content: the classifier replayed — same phrase
    # alternations (regexp_extract_all count == Spark's regexp_count:
    # both leftmost-first, non-overlapping), same token count, same
    # weight arithmetic in the same evaluation order, rounded 4dp
    # BEFORE the threshold compare exactly as the operator does.
    _s404_body = "|".join((
        "page not found", "404", "not be found", "does not exist",
        "no longer available", "has been removed", "has been deleted",
        "nothing was found", "an error occurred"))
    _s404_title = "404|not found|error|page missing"
    o["soft404_content"] = f"""
        WITH pages AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 0
                      THEN '404 Not Found - ' || source
                      ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title,
                 CASE WHEN doc_id % 13 = 0
                      THEN '404 page not found. The page you requested '
                           || 'does not exist or is no longer available '
                           || 'on ' || source || '.'
                      WHEN doc_id % 13 = 5
                      THEN 'some links now answer page not found '
                           || 'which is why ' || text
                      ELSE text END AS body
          FROM documents),
        sig AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(lower(body),
                          '{_s404_body}')) AS INT) AS err_hits,
                 CASE WHEN regexp_matches(lower(title), '{_s404_title}')
                      THEN 1 ELSE 0 END AS title_err,
                 CAST(len({_SQL_TOKS.format(t="lower(body)")}) AS INT)
                   AS n_tokens
          FROM pages)
        SELECT doc_id, err_hits, title_err, n_tokens,
               round(title_err * 0.4 + least(err_hits, 3) * 0.25
                     + (CASE WHEN n_tokens < 40 THEN 1 ELSE 0 END) * 0.2,
                     4) AS soft404_score,
               round(title_err * 0.4 + least(err_hits, 3) * 0.25
                     + (CASE WHEN n_tokens < 40 THEN 1 ELSE 0 END) * 0.2,
                     4) >= 0.6 AS is_soft404
        FROM sig
    """

    # soft404_probe: Bar-Yossef probe similarity replayed — the same
    # error template with only the requested path differing, 3-gram
    # shingle Jaccard rounded 4dp before the 0.8 threshold.
    _s404_tmpl = (
        "404 page not found. The page you requested does not exist on "
        "this server or is no longer available. Please verify the "
        "address you typed and then try your request again later. "
        "Requested path ")
    _probe_toks = _SQL_TOKS.format(t="body")
    _probe_sh = _SQL_SHINGLES.format(toks=_probe_toks)
    _pr_toks = _SQL_TOKS.format(t="probe_text")
    _pr_sh = _SQL_SHINGLES.format(toks=_pr_toks)
    o["soft404_probe"] = f"""
        WITH pages AS (
          SELECT source || '.probe.test' AS host,
                 'https://' || source || '.probe.test/d/'
                   || CAST(doc_id AS VARCHAR) AS url,
                 CASE WHEN doc_id % 17 = 0
                      THEN '{_s404_tmpl}' || '/d/'
                           || CAST(doc_id AS VARCHAR)
                      ELSE text END AS body
          FROM documents),
        probes AS (
          SELECT DISTINCT source || '.probe.test' AS host,
                 '{_s404_tmpl}' || '/zz-probe' AS probe_text
          FROM documents),
        sh AS (SELECT host, url, {_probe_sh} AS ps FROM pages),
        pr AS (SELECT host, {_pr_sh} AS qs FROM probes),
        j AS (
          SELECT sh.url,
                 CASE WHEN len(list_distinct(list_concat(ps, qs))) > 0
                      THEN round(len(list_intersect(ps, qs)) * 1.0
                           / len(list_distinct(list_concat(ps, qs))), 4)
                 END AS probe_jaccard
          FROM sh JOIN pr USING (host))
        SELECT url, probe_jaccard,
               coalesce(probe_jaccard >= 0.8, false) AS is_soft404
        FROM j
    """

    # quantile_sketch: the decimal log-histogram replayed in pure
    # integer arithmetic — same fixed-pointing, same leading-digit
    # buckets, same signed-midpoint cumulative walk. The split+merge on
    # the Spark side collapses to a direct build here because bucket
    # merge is count addition (the property under test).
    o["quantile_sketch"] = """
        WITH fp AS (
          SELECT event_type,
                 CAST(round(value * 100) AS BIGINT) AS v
          FROM events),
        s AS (
          SELECT event_type,
                 CASE WHEN v < 0 THEN -1 WHEN v > 0 THEN 1 ELSE 0 END
                   AS sign,
                 abs(v) AS a
          FROM fp),
        bk AS (
          SELECT event_type, sign,
                 CASE WHEN len(CAST(a AS VARCHAR)) <= 2 THEN a
                      ELSE CAST(substring(CAST(a AS VARCHAR), 1, 2)
                               AS BIGINT)
                           * CAST(power(10, len(CAST(a AS VARCHAR)) - 2)
                                 AS BIGINT) END AS lo,
                 CASE WHEN len(CAST(a AS VARCHAR)) <= 2 THEN a + 1
                      ELSE (CAST(substring(CAST(a AS VARCHAR), 1, 2)
                                AS BIGINT) + 1)
                           * CAST(power(10, len(CAST(a AS VARCHAR)) - 2)
                                 AS BIGINT) END AS hi,
                 count(*) AS cnt
          FROM s GROUP BY 1, 2, 3, 4),
        cum AS (
          SELECT event_type, sign * (lo + hi) AS rep2x, cnt,
                 sum(cnt) OVER (PARTITION BY event_type
                                ORDER BY sign * (lo + hi)) AS cum,
                 sum(cnt) OVER (PARTITION BY event_type) AS n
          FROM bk),
        hits AS (
          SELECT event_type, q, rep2x, n
          FROM cum CROSS JOIN (
            SELECT unnest([0.5, 0.9, 0.99]) AS q)
          WHERE cum >= greatest(CAST(ceil(q * n) AS BIGINT), 1))
        SELECT event_type, q, round(min(rep2x) / 200.0, 6) AS est,
               CAST(min(n) AS BIGINT) AS n
        FROM hits GROUP BY event_type, q
    """

    # ip_politeness: the md5-prefix IP assignment and the two windows
    # replayed; the salted two-stage collapses to the single per-IP
    # window (exactness argument in select_ip_polite_batch).
    o["ip_politeness"] = """
        WITH f AS (
          SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.ip.test'
                   AS host,
                 'https://h' || CAST(doc_id % 40 AS VARCHAR)
                   || '.ip.test/d/' || CAST(doc_id AS VARCHAR) AS url
          FROM documents),
        hosts AS (SELECT DISTINCT host FROM f),
        ips AS (
          SELECT host,
                 '10.0.'
                 || CAST((('0x' || substring(md5(host), 1, 8))::BIGINT
                          % 8) // 256 AS VARCHAR)
                 || '.'
                 || CAST((('0x' || substring(md5(host), 1, 8))::BIGINT
                          % 8) % 256 AS VARCHAR) AS ip
          FROM hosts),
        r AS (
          SELECT f.host, f.url, ips.ip,
                 row_number() OVER (PARTITION BY ips.ip, f.host
                                    ORDER BY f.url) AS host_rank
          FROM f JOIN ips USING (host)),
        sel AS (
          SELECT *, row_number() OVER (
                   PARTITION BY ip
                   ORDER BY host_rank, host, url) AS ip_rank
          FROM r)
        SELECT ip, host, url, host_rank, ip_rank
        FROM sel WHERE ip_rank <= 6
    """

    # blockmax_topk: pruning is lossless by construction, so the oracle
    # IS the full-index BM25 ranking — the strongest possible check.
    o["blockmax_topk"] = o["bm25_topk"]

    # blockmax_plan: block maxima over every query-term posting's true
    # score, champion top-15 replayed for theta (with the same
    # filled-k guard), token-ordered fold of the <=3 per-block ubs.
    o["blockmax_plan"] = f"""
        WITH toksv AS (
          SELECT doc_id, unnest({toks_doc}) AS token FROM documents),
        dl AS (SELECT doc_id, count(*) AS dl FROM toksv GROUP BY doc_id),
        dlf AS (
          SELECT coalesce(dl.dl, 0) AS dl
          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
        g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     avg(CAST(dl AS DOUBLE)) AS avgdl FROM dlf),
        tfx AS (SELECT doc_id, token, count(*) AS tf
                FROM toksv WHERE token IN ('join', 'hash', 'scan')
                GROUP BY doc_id, token),
        dfq AS (SELECT token, count(*) AS df FROM tfx GROUP BY token),
        per_all AS (
          SELECT tfx.doc_id, tfx.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(tfx.tf AS DOUBLE) * 2.2
                    / (CAST(tfx.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM tfx JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        bm AS (
          SELECT token, doc_id // 64 AS block_id,
                 count(*) AS np, max(s) AS ub
          FROM per_all GROUP BY 1, 2),
        champ AS (
          SELECT doc_id, token, tf FROM (
            SELECT doc_id, token, tf,
                   row_number() OVER (
                     PARTITION BY token
                     ORDER BY tf DESC, doc_id ASC) AS rn
            FROM tfx)
          WHERE rn <= 32),
        cper AS (
          SELECT champ.doc_id, champ.token,
                 ln(1.0 + (g.n - dfq.df + 0.5)
                          / (CAST(dfq.df AS DOUBLE) + 0.5))
                 * (CAST(champ.tf AS DOUBLE) * 2.2
                    / (CAST(champ.tf AS DOUBLE)
                       + 1.2 * (1.0 - 0.75
                                + 0.75 * CAST(dl.dl AS DOUBLE)
                                  / g.avgdl))) AS s
          FROM champ JOIN dfq USING (token) JOIN dl USING (doc_id), g),
        cfold AS (
          SELECT doc_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token, s := s))),
                     x -> x['s']),
                   (a, c) -> a + c), 6) AS score
          FROM cper GROUP BY doc_id),
        ctop AS (
          SELECT score FROM (
            SELECT score,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC)
                     AS rank
            FROM cfold)
          WHERE rank <= 15),
        theta AS (
          SELECT CASE WHEN count(*) >= 15 THEN min(score)
                      ELSE -1e308 END AS th
          FROM ctop),
        plan AS (
          SELECT block_id,
                 round(list_reduce(
                   list_transform(
                     list_sort(list(struct_pack(token := token,
                                                ub := ub))),
                     x -> x['ub']),
                   (a, c) -> a + c), 6) AS ub_sum,
                 CAST(sum(np) AS BIGINT) AS n_postings
          FROM bm GROUP BY block_id)
        SELECT block_id, ub_sum, n_postings,
               ub_sum < (SELECT th FROM theta) AS skippable
        FROM plan
    """

    # robots_compliance: the audit replayed with the robots semantics
    # resolved by hand — /private-prefix (even hosts) and /priv*
    # wildcard (odd) both convict exactly the doc_id%7 fetches; the
    # even hosts' parsed Crawl-delay is 2+(h/2)%3; the lag-gap window
    # replays ordered (t, url).
    o["robots_compliance"] = """
        WITH f AS (
          SELECT doc_id, doc_id % 10 AS h, doc_id // 10 AS i
          FROM documents),
        log AS (
          SELECT 'h' || CAST(h AS VARCHAR) || '.rc.test' AS host, h,
                 'https://h' || CAST(h AS VARCHAR) || '.rc.test'
                   || CASE WHEN doc_id % 7 = 0 THEN '/private/p'
                           ELSE '/page/p' END
                   || CAST(doc_id AS VARCHAR) AS url,
                 CAST(i * 5 - CASE WHEN i % 4 = 3 THEN 4 ELSE 0 END
                      AS DOUBLE) AS t,
                 doc_id % 7 = 0 AS dis
          FROM f),
        g AS (
          SELECT host, h, dis,
                 t - lag(t) OVER (PARTITION BY host ORDER BY t, url)
                   AS gap
          FROM log),
        agg AS (
          SELECT host,
                 count(*) AS n_fetches,
                 CAST(sum(CASE WHEN dis THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_disallowed,
                 CAST(sum(CASE WHEN gap IS NOT NULL AND h % 2 = 0
                               AND gap < (2 + (h // 2) % 3)
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_delay_violations,
                 round(min(gap), 6) AS min_gap_s
          FROM g GROUP BY host, h)
        SELECT host, n_fetches, n_disallowed, n_delay_violations,
               min_gap_s,
               n_disallowed = 0 AND n_delay_violations = 0 AS compliant
        FROM agg
    """

    # size_drift_sketch: the quantile-sketch walk instantiated per
    # snapshot half and joined — same integer bucket arithmetic as
    # quantile_sketch, [0.5, 0.99], drift rounded 6dp
    def _hist_q_sql(pred: str) -> str:
        return f"""(
          WITH fp AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
            FROM events WHERE {pred}),
          s AS (
            SELECT event_type,
                   CASE WHEN v < 0 THEN -1 WHEN v > 0 THEN 1 ELSE 0 END
                     AS sign,
                   abs(v) AS a
            FROM fp),
          bk AS (
            SELECT event_type, sign,
                   CASE WHEN len(CAST(a AS VARCHAR)) <= 2 THEN a
                        ELSE CAST(substring(CAST(a AS VARCHAR), 1, 2)
                                 AS BIGINT)
                             * CAST(power(10,
                                    len(CAST(a AS VARCHAR)) - 2)
                                   AS BIGINT) END AS lo,
                   CASE WHEN len(CAST(a AS VARCHAR)) <= 2 THEN a + 1
                        ELSE (CAST(substring(CAST(a AS VARCHAR), 1, 2)
                                  AS BIGINT) + 1)
                             * CAST(power(10,
                                    len(CAST(a AS VARCHAR)) - 2)
                                   AS BIGINT) END AS hi,
                   count(*) AS cnt
            FROM s GROUP BY 1, 2, 3, 4),
          cum AS (
            SELECT event_type, sign * (lo + hi) AS rep2x, cnt,
                   sum(cnt) OVER (PARTITION BY event_type
                                  ORDER BY sign * (lo + hi)) AS cum,
                   sum(cnt) OVER (PARTITION BY event_type) AS n
            FROM bk),
          hits AS (
            SELECT event_type, q, rep2x
            FROM cum CROSS JOIN (
              SELECT unnest([0.5, 0.99]) AS q)
            WHERE cum >= greatest(CAST(ceil(q * n) AS BIGINT), 1))
          SELECT event_type, q, round(min(rep2x) / 200.0, 6) AS est
          FROM hits GROUP BY event_type, q)"""

    o["size_drift_sketch"] = f"""
        WITH half AS (SELECT count(*) / 2.0 AS h FROM events),
        oldq AS {_hist_q_sql("event_id < (SELECT h FROM half)")},
        newq AS {_hist_q_sql("event_id >= (SELECT h FROM half)")}
        SELECT o.event_type, o.q, o.est AS est_old, n.est AS est_new,
               round(n.est - o.est, 6) AS drift
        FROM oldq o JOIN newq n
          ON n.event_type = o.event_type AND n.q = o.q
    """

    # bloom_point_read: superset guarantee + exact row predicate means
    # the oracle is just the two present rows (the absent probe
    # contributes nothing whatever files its filter admits)
    o["bloom_point_read"] = """
        SELECT 'https://h' || CAST(doc_id % 23 AS VARCHAR)
                 || '.bp.test/d/' || CAST(doc_id AS VARCHAR) AS url,
               doc_id, lang
        FROM documents WHERE doc_id IN (100, 33)
    """

    # percolate_alerts: the inverted standing-query join replayed
    o["percolate_alerts"] = f"""
        WITH qs(query_id, terms) AS (VALUES
          ('q_joinhash', ['join', 'hash']),
          ('q_scan', ['scan']),
          ('q_triple', ['table', 'row', 'value']),
          ('q_dup', ['batch', 'batch', 'slow']),
          ('q_miss', ['join', 'zzzz']),
          ('q_none', ['qqqq'])),
        qt AS (
          SELECT query_id,
                 len(list_distinct(terms)) AS nq,
                 unnest(list_distinct(terms)) AS token
          FROM qs),
        dt AS (
          SELECT doc_id,
                 unnest(list_distinct({toks_doc})) AS token
          FROM documents),
        hits AS (
          SELECT doc_id, query_id,
                 count(*) AS n_matched,
                 CAST(min(nq) AS INT) AS n_terms
          FROM dt JOIN qt USING (token)
          GROUP BY 1, 2)
        SELECT doc_id, query_id, n_matched, n_terms
        FROM hits WHERE n_matched = n_terms
    """

    # stream_percolate: per-document operation, so the streamed union
    # equals the batch result exactly — same oracle
    o["stream_percolate"] = o["percolate_alerts"]

    # cdc_dedup: the Gear rolling-hash chunker replayed as a byte fold
    # — list_reduce with a prepended seed (element type == acc type),
    # the md5-derived GEAR table inlined (ASCII payloads: only entries
    # 0..127 are reachable, where md5(chr(b)) == md5(bytes([b]))), and
    # md5 as the chunk-distinctness key (the ledger is digest-free
    # aggregates; any injective digest yields identical stats).
    # ACCUMULATOR IS A FLAT BIGINT LIST [h, start, end1, end2, ...]:
    # a STRUCT(...)[] list inside the accumulator returns scrambled
    # starts under DuckDB 1.0's vectorized lambda execution once many
    # rows fold at once (single-row folds are correct — verified 513
    # of 1000 segments corrupted in batch mode), so chunk (start, len)
    # pairs are re-derived from the boundary-end list afterwards.
    import hashlib as _hl

    _gear = "[" + ",".join(
        str(int.from_bytes(_hl.md5(bytes([i])).digest()[:4], "big"))
        for i in range(128)) + "]"
    _cdc_min, _cdc_max, _cdc_mod = 32, 2048, 1 << 8
    o["cdc_dedup"] = f"""
        WITH segs AS MATERIALIZED (
          SELECT doc_id AS seg,
                 array_to_string(list_transform(range(4), i -> text),
                                 ' ') AS s
          FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS seg,
                 'shift-' || CAST(doc_id AS VARCHAR) || ' '
                   || array_to_string(list_transform(range(4),
                                                     i -> text), ' ')
                   AS s
          FROM documents),
        folded AS MATERIALIZED (
          SELECT seg, s,
            list_reduce(
              list_prepend(
                CAST([0, 0] AS BIGINT[]),
                list_transform(range(1, length(s) + 1),
                               i -> CAST([i] AS BIGINT[]))),
              (acc, x) -> CASE
                WHEN ((x[1] - acc[2] >= {_cdc_min}
                       AND (acc[1] * 2 + {_gear}[
                              ord(substring(s, CAST(x[1] AS INT), 1))
                              + 1])
                           % 4294967296 % {_cdc_mod} = 0)
                      OR x[1] - acc[2] >= {_cdc_max})
                THEN list_concat([CAST(0 AS BIGINT), x[1]],
                                 acc[3:] || [x[1]])
                ELSE list_concat(
                       [(acc[1] * 2 + {_gear}[
                           ord(substring(s, CAST(x[1] AS INT), 1))
                           + 1]) % 4294967296,
                        acc[2]], acc[3:])
              END) AS f
          FROM segs),
        bounds AS (
          SELECT seg, s,
                 CASE WHEN f[2] < length(s)
                      THEN (f[3:] || [CAST(length(s) AS BIGINT)])
                      ELSE f[3:] END AS ends
          FROM folded),
        ch AS (
          SELECT seg, s, ends,
                 unnest(range(1, len(ends) + 1)) AS i
          FROM bounds),
        dig AS (
          SELECT md5(substring(
                   s,
                   CAST(CASE WHEN i = 1 THEN 0
                        ELSE ends[CAST(i AS INT) - 1] END AS INT) + 1,
                   CAST(ends[CAST(i AS INT)]
                        - CASE WHEN i = 1 THEN 0
                          ELSE ends[CAST(i AS INT) - 1] END AS INT)))
                   AS d,
                 CAST(ends[CAST(i AS INT)]
                      - CASE WHEN i = 1 THEN 0
                        ELSE ends[CAST(i AS INT) - 1] END AS INT)
                   AS length
          FROM ch),
        uniq AS (
          SELECT d, min(length) AS length, count(*) AS copies
          FROM dig GROUP BY d)
        SELECT CAST(sum(copies) AS BIGINT) AS total_chunks,
               count(*) AS unique_chunks,
               CAST(sum(copies * length) AS BIGINT) AS logical_bytes,
               CAST(sum(length) AS BIGINT) AS stored_bytes,
               round(sum(length) * 1.0 / sum(copies * length), 6)
                 AS dedup_ratio
        FROM uniq
    """

    # schema_evolution_read: nulls for pre-evolution rows made explicit
    o["schema_evolution_read"] = """
        SELECT lang, count(*) AS n_docs,
               count(CASE WHEN doc_id % 2 = 1 THEN n_chars END)
                 AS n_with_chars,
               CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END)
                    AS BIGINT) AS chars
        FROM documents GROUP BY lang
    """

    # kmv_set_ops: the KMV algebra replayed — same md5-prefix hashes,
    # same bottom-16s, union = bottom-16 of the merged pairs, Jaccard
    # as the both-members fraction of the union sample
    _kmv_est = ("CASE WHEN n < 16 THEN CAST(n AS DOUBLE) "
                "ELSE round(15.0 / (hs[16] / 4294967296.0), 6) END")
    o["kmv_set_ops"] = f"""
        WITH da AS (
          SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v
          FROM events WHERE event_id % 2 = 0),
        db AS (
          SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS v
          FROM events WHERE event_id % 2 = 1),
        ha AS (SELECT event_type, v,
                      ('0x' || substring(md5(v), 1, 8))::BIGINT AS h
               FROM da),
        hb AS (SELECT event_type, v,
                      ('0x' || substring(md5(v), 1, 8))::BIGINT AS h
               FROM db),
        ra AS (SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY h, v) AS rn
               FROM ha),
        rb AS (SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY h, v) AS rn
               FROM hb),
        sa AS (SELECT event_type, list(v ORDER BY h, v) AS mem,
                      list(h ORDER BY h, v) AS hs, count(*) AS n
               FROM ra WHERE rn <= 16 GROUP BY 1),
        sb AS (SELECT event_type, list(v ORDER BY h, v) AS mem,
                      list(h ORDER BY h, v) AS hs, count(*) AS n
               FROM rb WHERE rn <= 16 GROUP BY 1),
        un AS (SELECT DISTINCT event_type, v, h FROM (
                 SELECT event_type, v, h FROM ra WHERE rn <= 16
                 UNION ALL
                 SELECT event_type, v, h FROM rb WHERE rn <= 16)),
        ru AS (SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY h, v) AS rn
               FROM un),
        su AS (SELECT event_type, list(v ORDER BY h, v) AS mem,
                      list(h ORDER BY h, v) AS hs, count(*) AS n
               FROM ru WHERE rn <= 16 GROUP BY 1),
        j AS (
          SELECT su.event_type,
                 (SELECT {_kmv_est} FROM (SELECT sa.hs AS hs,
                     sa.n AS n)) AS a_est,
                 (SELECT {_kmv_est} FROM (SELECT sb.hs AS hs,
                     sb.n AS n)) AS b_est,
                 (SELECT {_kmv_est} FROM (SELECT su.hs AS hs,
                     su.n AS n)) AS union_est,
                 round(len(list_filter(su.mem,
                       m -> list_contains(sa.mem, m)
                            AND list_contains(sb.mem, m))) * 1.0
                       / greatest(su.n, 1), 6) AS jaccard,
                 CAST(su.n AS INT) AS sample_union
          FROM su JOIN sa USING (event_type)
                  JOIN sb USING (event_type))
        SELECT event_type, a_est, b_est, union_est, jaccard,
               round(jaccard * union_est, 6) AS intersection_est,
               sample_union
        FROM j
    """

    # unigram tokenizer family: seed / one-hard-EM-round vocabulary /
    # corpus fertility, all over the same unrolled chain (only the
    # CTEs each query references are evaluated)
    # maxlen bounds the DP unroll; the corpora's longest token is 8
    # chars, and tests/test_unigram.py pins max word length <= this
    # constant so a fixture/tokenizer change cannot silently truncate
    # the oracle (words longer than maxlen would vanish from vit)
    _uni = _sql_unigram_chain(maxlen=12, mpl=4, seed_size=20)
    o["unigram_seed"] = f"""
        WITH {_uni}
        SELECT piece, count FROM seed
    """
    o["unigram_vocab"] = f"""
        WITH {_uni}
        SELECT piece, count FROM trained
    """
    o["unigram_tokens"] = f"""
        WITH {_uni},
        wnp AS (SELECT word, len(path) AS n_pieces FROM vit2),
        dt AS (SELECT doc_id, unnest({toks_doc}) AS word
               FROM documents)
        SELECT doc_id, CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
               count(*) AS n_words
        FROM dt JOIN wnp USING (word)
        GROUP BY doc_id
    """

    # curation_pipeline_v2 embeds the full curation SQL (defined later in
    # this function than the v2 template) as its survivors CTE.
    o["curation_pipeline_v2"] = o["curation_pipeline_v2"].replace(
        "{curation}", o["curation_pipeline"])

    # curation_pipeline_v3: stage composition by CTE nesting — the
    # boilerplate-strip result (doc_id, text) becomes the table the
    # ExactSubstr SQL reads (its only source reference is the base CTE)
    o["curation_pipeline_v3"] = f"""
        WITH hb AS ({o["host_boilerplate"]}),
        mid AS (SELECT doc_id, text FROM hb),
        es AS ({o["exactsubstr_strip"].replace("FROM documents",
                                               "FROM mid")})
        SELECT * FROM es
    """

    return o
