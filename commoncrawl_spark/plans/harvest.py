"""Index harvesting — the reference's entry point #1 as ONE composed plan.

Reference stage graph (create_tasks.py -> download_and_merge.py /
cc_merge_indexes.py): index list -> [resume anti-join] -> one task per
CDX page -> HTTP page fetch -> JSONL parse (skip malformed lines) ->
canonicalize + choose_better_record fold -> merged index, with an
index's pages committed all-or-nothing (cc_merge_indexes.py:93-121).

Engine composition, all existing operators:
  tasks_from_indexes (S7, sources/tasks.py)
    -> Transport.fetch (S5, sources/transport.py — lookup join in the
       sandbox, HttpRangeTransport live)
    -> ``parse_cdx_pages`` below: JVM-side JSONL split + from_json
       (S1 PERMISSIVE semantics: unparseable lines become nulls and are
       dropped, download_and_merge.py:41-43)
    -> split_complete_groups (ST5, operators/groups.py: a failed page
       fails its whole index; those indexes re-queue wholesale)
    -> best_capture_per_url (A1+A2, operators/dedup.py) via
       ``merge_harvested``.

Arrival order for the dedup fold is (index, page, line_no) — index
names lead and CC-MAIN-YYYY-WW sorts chronologically, matching the
INDEXES-list order of create_tasks.py:12; line_no is the line's
position within its page file, the reference's within-file order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import best_capture_per_url
from ..operators.groups import split_complete_groups
from ..sources.tasks import DEFAULT_API_BASE, tasks_from_indexes

# CDX API record: all values arrive as strings (SURVEY.md §1.2); numeric
# casts happen at use, exactly like the reference's int(record["..."])
CDX_RECORD_SCHEMA = T.StructType([
    T.StructField("urlkey", T.StringType()),
    T.StructField("timestamp", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("mime", T.StringType()),
    T.StructField("mime-detected", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("digest", T.StringType()),
    T.StructField("length", T.StringType()),
    T.StructField("offset", T.StringType()),
    T.StructField("filename", T.StringType()),
])


def parse_cdx_pages(fetched: DataFrame, body_col: str = "html") -> DataFrame:
    """Fetched page bodies -> one row per parsed CDX record.

    JVM-only: split the body on newlines, posexplode (line_no = position
    within the page, the fold's within-file arrival order), from_json
    each line. Malformed lines parse to null and are dropped — the
    reference's json.JSONDecodeError skip (download_and_merge.py:41-43)
    — but never silently: callers can diff input line counts if they
    need an audit (the reference doesn't)."""
    lines = F.split(F.col(body_col).cast("string"), r"\r?\n")
    exploded = fetched.select(
        "index", "page", F.posexplode(lines).alias("line_no", "_line")
    ).filter(F.trim("_line") != "")
    rec = F.from_json(F.col("_line"), CDX_RECORD_SCHEMA)
    return (
        exploded.select("index", "page", "line_no", rec.alias("_r"))
        .filter(F.col("_r").isNotNull() & F.col("_r.url").isNotNull())
        .select(
            "index", "page", "line_no",
            F.col("_r.urlkey").alias("urlkey"),
            F.col("_r.timestamp").alias("timestamp"),
            F.col("_r.url").alias("url"),
            F.col("_r.mime").alias("mime"),
            F.col("_r").getField("mime-detected").alias("mime_detected"),
            F.col("_r.status").alias("status"),
            F.col("_r.digest").alias("digest"),
            F.col("_r.length").alias("length"),
            F.col("_r.offset").alias("offset"),
            F.col("_r.filename").alias("filename"),
        )
    )


def harvest_indexes(
    indexes: DataFrame,
    transport,
    target_url: str,
    api_base: str = DEFAULT_API_BASE,
    processed: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(cdx_records, failed_indexes): fan out, fetch, parse, and apply
    the fail-fast index gate. ``failed_indexes`` (one ``index`` column)
    is the wholesale re-queue set — feed it back as the next attempt's
    ``indexes`` (minus ``processed``), the reference's retry loop."""
    tasks = tasks_from_indexes(indexes, target_url, api_base, processed)
    fetched = transport.fetch(tasks)
    committable, held = split_complete_groups(fetched, "index")
    failed_indexes = held.select("index").distinct()
    return parse_cdx_pages(committable), failed_indexes


def merge_harvested(cdx_records: DataFrame) -> DataFrame:
    """A1+A2 over harvested records: one winner per canonical URL, the
    exact arrival-order fold (index, page, line_no)."""
    return best_capture_per_url(
        cdx_records.withColumnRenamed("index", "crawl"),
        arrival_cols=("crawl", "page", "line_no"),
    )
