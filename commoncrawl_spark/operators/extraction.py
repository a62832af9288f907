"""Extraction operator: pages(url, html, ...) -> articles + error side-channel.

Spark-first shape of the reference's extraction stage
(extract_from_warc.py:158-258): the multiprocessing.Pool becomes the
executor's Arrow-batched pandas UDF; the chunked JSONL writer becomes a
table append; the extraction_failed.log becomes an error side-output
DataFrame (never silently dropped — F4 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import extract_article_udf
from ..functions.urls import page_id_col


def extract_articles(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Attach the extracted article struct. Narrow (no shuffle): the UDF runs
    where the pages partitions already live."""
    return pages.withColumn("article", extract_article_udf(F.col(html_col)))


def split_articles(with_struct: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(articles, failures). Article id = md5(url) for reference parity
    (download_warc_segments.py:46-48 names files md5(url).warc.gz and
    extract_from_warc.py:164,179 carries that stem as the record id)."""
    ok = (
        with_struct.filter(F.col("article.error").isNull())
        .select(
            page_id_col(F.col("url")).alias("id"),
            "url",
            "article.title",
            "article.publish_time",
            "article.author",
            "article.text",
            "article.signposting_tags",
            "article.section_labels",
            "article.keyword_tags",
        )
    )
    failed = (
        with_struct.filter(F.col("article.error").isNotNull())
        .select("url", F.col("article.error").alias("reason"))
    )
    return ok, failed
