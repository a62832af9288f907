"""Byte-identity of extraction: Spark pandas-UDF output == pure-Python oracle
== the golden `text` column computed at fixture-generation time.

Mirrors the reference semantics at extract_from_warc.py:33-156.
"""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

from commoncrawl_spark.functions.extract import (
    extract_article,
    extract_from_warc_bytes,
    html_from_warc,
    parse_html,
)
from commoncrawl_spark.operators.extraction import extract_articles, split_articles

HTML = """
<html><body>
<ul class="signposting">
 <li class="signposting__item"><a href="/">Home</a></li>
 <li class="signposting__item"><a href="/world">World</a></li>
</ul>
<h1 class="content__headline js-headline">Big <em>News</em> Today</h1>
<time itemprop="datePublished" datetime="2020-01-02T03:04:05+00:00">Jan 2</time>
<a rel="author" href="/profile/x">Jane Doe</a>
<div itemprop="articleBody">
  <script>bad()</script><style>.x{}</style><aside>noise</aside>
  <p>First paragraph.</p>
  <p>Second <b>bold</b> paragraph.</p>
</div>
<div class="submeta__keywords"><a class="submeta__link" href="/t/a">Alpha</a>
<a class="submeta__link" href="/t/b">Beta</a></div>
</body></html>
"""


def test_extract_article_fields():
    out = extract_article(HTML)
    assert out["title"] == "BigNewsToday"  # bs4 strip=True joins stripped strings
    assert out["publish_time"] == "2020-01-02T03:04:05+00:00"
    assert out["author"] == "Jane Doe"
    assert out["text"] == "First paragraph.\nSecond\nbold\nparagraph."
    assert out["signposting_tags"] == ["World"]  # 'Home' excluded
    assert out["section_labels"] == []
    assert out["keyword_tags"] == ["Alpha", "Beta"]


def test_body_fallback_class_and_decompose():
    html = '<div class="content__article-body x"><aside>no</aside><p>Keep me.</p></div>'
    assert extract_article(html)["text"] == "Keep me."


def test_signposting_fallback_chain():
    subnav = (
        '<ul class="subnav__list"><li class="subnav__item">'
        '<a class="subnav-link" href="/s">Sport</a></li></ul>'
    )
    assert extract_article(subnav)["signposting_tags"] == ["Sport"]
    labels = '<div class="content__labels"><a href="/c">Culture</a><a>NoHref</a></div>'
    assert extract_article(labels)["signposting_tags"] == ["Culture"]


def test_keyword_fallback_chain():
    kwlist = (
        '<ul class="keyword-list"><li><a itemprop="keywords" href="/k">K1</a></li></ul>'
    )
    assert extract_article(kwlist)["keyword_tags"] == ["K1"]
    sublinks = (
        '<ul class="submeta__links"><li><a class="submeta__link" href="/k">K2</a></li></ul>'
    )
    assert extract_article(sublinks)["keyword_tags"] == ["K2"]


def test_html_from_warc_charset_chain():
    body = "<html><body>café</body></html>"
    for charset in ["utf-8", "iso-8859-1"]:
        raw = (
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset="
            + charset.encode() + b"\r\n\r\n" + body.encode(charset)
        )
        assert html_from_warc(gzip.compress(raw)) == body
        assert html_from_warc(raw) == body  # pass-through branch


def test_html_from_warc_missing_separators():
    assert html_from_warc(b"no separators at all") == "no separators at all"


def test_error_side_channel():
    out = extract_from_warc_bytes(b"")
    assert out["error"] is not None and out["text"] is None
    # valid framing but no articleBody -> empty text -> error (F4)
    raw = b"WARC/1.0\r\n\r\nHTTP/1.1 200 OK\r\n\r\n<html><p>hi</p></html>"
    out = extract_from_warc_bytes(raw)
    assert "empty" in out["error"].lower()


def test_minisoup_multivalued_attrs():
    root = parse_html('<a rel="author nofollow" href="/x">A</a>')
    assert root.find("a", attrs={"rel": "author"}) is not None
    assert root.find("a", attrs={"rel": "editor"}) is None


@pytest.mark.spark
def test_spark_udf_byte_identity(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    ok, failed = split_articles(extract_articles(pages))
    got = {r["url"]: r["text"] for r in ok.select("url", "text").collect()}

    pdf = pd.read_parquet(f"{fixture_dir}/pages.parquet", columns=["url", "html", "text"])
    oracle_ok = pdf[pdf["text"].notna() & (pdf["text"].str.strip() != "")]
    expect = dict(zip(oracle_ok["url"], oracle_ok["text"]))

    assert set(got) == set(expect)
    mismatches = [u for u in expect if got[u] != expect[u]]
    assert mismatches == [], f"text bytes differ for {len(mismatches)} urls"
    # error side-channel covers exactly the rest
    n_failed = failed.count()
    assert n_failed == len(pdf) - len(oracle_ok)


@pytest.mark.spark
def test_spark_udf_matches_module_oracle_rowwise(spark, fixture_dir):
    """UDF output equals calling the shared module directly (full struct).

    extract_articles drops the fat html column at its barrier, so the
    oracle bytes are re-read from the fixture and joined on url."""
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").limit(50)
    rows = extract_articles(pages).select("url", "article").collect()
    pdf = pd.read_parquet(f"{fixture_dir}/pages.parquet", columns=["url", "html"])
    html_by_url = dict(zip(pdf["url"], pdf["html"]))
    for r in rows:
        oracle = extract_from_warc_bytes(html_by_url[r["url"]])
        got = r["article"].asDict(recursive=True)
        assert got == oracle, f"struct mismatch for {r['url']}"


@pytest.mark.spark
def test_sniff_mime_binary_magics(spark):
    """Real non-ASCII signatures byte-for-byte: gzip, PNG, JPEG, zip,
    GIF87a, RIFF; NUL-bearing unknown bytes fall to octet-stream and
    NUL-free unknown text to text/plain."""
    import gzip as _gzip

    from pyspark.sql import functions as F

    from commoncrawl_spark.functions.extract import sniff_mime_col

    payloads = {
        "gz": _gzip.compress(b"x", mtime=0),
        "png": b"\x89PNG\r\n\x1a\nrest",
        "jpg": b"\xff\xd8\xff\xe0\x00\x10JFIF",
        "zip": b"PK\x03\x04....",
        "gif87": b"GIF87a....",
        "webp": b"RIFF\x10\x00\x00\x00WEBPVP8 ",
        "wav": b"RIFFxxxxWAVE",
        "avi": b"RIFFxxxxAVI LIST",
        "riff_other": b"RIFFxxxxACON",
        "nul": b"\x00\x01\x02binary-ish",
        "plain": b"just some words",
        "json_ws": b"   [1, 2]",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in payloads.items()], "k string, payload binary")
    got = {r["k"]: r["mime"]
           for r in df.select(
               "k",
               sniff_mime_col(F.col("payload")).alias("mime")).collect()}
    assert got == {
        "gz": "application/gzip",
        "png": "image/png",
        "jpg": "image/jpeg",
        "zip": "application/zip",
        "gif87": "image/gif",
        "webp": "image/webp",
        "wav": "audio/x-wav",
        "avi": "video/x-msvideo",
        "riff_other": "application/x-riff",
        "nul": "application/octet-stream",
        "plain": "text/plain",
        "json_ws": "application/json",
    }


@pytest.mark.spark
def test_sniff_mime_lying_content_type(spark):
    """The real-crawl case the sniffer exists for: bytes win over any
    server-declared label — a 'text/html' response that is actually
    gzip routes to gzip."""
    import gzip as _gzip

    from pyspark.sql import functions as F

    from commoncrawl_spark.functions.extract import sniff_mime_col

    df = spark.createDataFrame(
        [("text/html", _gzip.compress(b"<html></html>", mtime=0))],
        "declared string, payload binary")
    row = df.select(sniff_mime_col(F.col("payload")).alias("m")).collect()[0]
    assert row["m"] == "application/gzip"


# ---------------------------------------------------------------------------
# publication-date extraction
# ---------------------------------------------------------------------------

def _pub(spark, html, url="https://h.test/post-1"):
    from pyspark.sql import functions as F

    from commoncrawl_spark.functions.extract import publication_date_cols

    df = spark.createDataFrame([(html, url)], "html string, url string")
    c = publication_date_cols(F.col("html"), F.col("url"))
    return df.select(c["pub_date"].alias("d"),
                     c["date_source"].alias("s")).collect()[0]


@pytest.mark.spark
def test_pub_date_precedence_og_beats_everything(spark):
    html = ('<meta property="article:published_time" '
            'content="2021-05-04T12:00:00Z">'
            '<time datetime="2022-01-01">x</time> body 2019-01-01.')
    r = _pub(spark, html)
    assert (r["d"], r["s"]) == ("2021-05-04", "og_meta")


@pytest.mark.spark
def test_pub_date_each_source_fires(spark):
    cases = [
        ('<meta name="date" content="2020-07-15">', None,
         "2020-07-15", "meta_date"),
        ('<time datetime="2022-03-09T08:00:00">t</time>', None,
         "2022-03-09", "time_tag"),
        ('<script>{"datePublished": "2023-12-25"}</script>', None,
         "2023-12-25", "json_ld"),
        ("no dates here", "https://h.test/2020/06/30/post",
         "2020-06-30", "url_path"),
        ("updated 2019-08-07 by staff", None, "2019-08-07", "text_iso"),
        ("nothing at all", None, None, "none"),
    ]
    for html, url, want_d, want_s in cases:
        r = _pub(spark, html, url or "https://h.test/post-1")
        assert (r["d"], r["s"]) == (want_d, want_s), html


@pytest.mark.spark
def test_pub_date_invalid_and_implausible_fall_through(spark):
    # calendar-invalid Feb 31 og falls to the URL date
    html = ('<meta property="article:published_time" '
            'content="2021-02-31T00:00:00Z">')
    r = _pub(spark, html, "https://h.test/2019/04/07/p")
    assert (r["d"], r["s"]) == ("2019-04-07", "url_path")
    # implausible years (epoch boilerplate, 9999 placeholder) rejected
    for bad in ("1970-01-01", "9999-12-31"):
        r = _pub(spark, f'<time datetime="{bad}">x</time>')
        assert (r["d"], r["s"]) == (None, "none"), bad
