"""Vectorized (Arrow-batched) pandas UDFs — the only Python in the hot path.

Per SURVEY.md section 2.9 exactly three things stay Python: article
extraction (here), URL canonicalization with punycode (functions.urls),
and per-bucket Bloom filters (operators.seen_set). Everything else is
native Catalyst.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import extract_from_warc_bytes

_ARR = T.ArrayType(T.StringType())
ARTICLE_STRUCT = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("publish_time", T.StringType()),
        T.StructField("author", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("signposting_tags", _ARR),
        T.StructField("section_labels", _ARR),
        T.StructField("keyword_tags", _ARR),
        T.StructField("error", T.StringType()),
    ]
)

_COLS = [
    "title", "publish_time", "author", "text",
    "signposting_tags", "section_labels", "keyword_tags", "error",
]


def _extract_batch(html: pd.Series) -> pd.DataFrame:
    records = [extract_from_warc_bytes(v) for v in html]
    return pd.DataFrame.from_records(records, columns=_COLS)


@F.pandas_udf(ARTICLE_STRUCT)
def extract_article_udf(batches: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    """WARC bytes -> article struct, one Arrow batch at a time.

    Iterator form so a partition of fat binary rows streams through the
    Python worker in bounded-memory batches
    (spark.sql.execution.arrow.maxRecordsPerBatch).
    """
    for html in batches:
        yield _extract_batch(html)
