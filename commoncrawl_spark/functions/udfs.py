"""Schema of the extraction output struct + the vectorized-Python policy.

Per SURVEY.md section 2.9 exactly five things stay Python: article
extraction (an Arrow-batched ``mapInPandas`` in
``operators/extraction.py`` — a *plan node*, not a column expression, so
Catalyst can neither push it below the fetch join nor evaluate it twice;
see that module's docstring for the measured failure mode), URL
canonicalization with punycode (functions.urls), per-bucket Bloom/cuckoo
filters (operators.seen_set / cuckoo), the zlib compression-ratio
quality signal (functions.text.compression_ratio_col — bytes-level
DEFLATE has no Catalyst equivalent), and Unicode NFC normalization
(functions.text.nfc_normalize_col — no Catalyst builtin; stdlib
``unicodedata``). Everything else is native Catalyst.
"""

from __future__ import annotations

from pyspark.sql import types as T

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
