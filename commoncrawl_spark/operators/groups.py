"""Fail-fast unit-of-work commits (ST5): all-or-nothing per group.

The reference's index-harvesting loop treats one CDX index as the unit
of work: if ANY page of an index fails, the whole index's output is
discarded and the index re-enters the retry queue wholesale
(cc_merge_indexes.py:93-102 collects per-page results, 119-121 rejects
the index on any failure). The engine's round loop is row-granular
(per-URL retry with backoff), which subsumes determinism — but a user
who wants the reference's visibility guarantee ("a sink never contains a
partially-harvested index") applies this split between fetch and sink.

Spark shape: one ``left_anti``/``left_semi`` pair against the distinct
failed-group keys — the failed-group side is tiny (one row per failed
group), so AQE broadcasts it; the data rows never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_complete_groups(
    results: DataFrame,
    group_col: str,
    error_col: str = "_fetch_error",
) -> tuple[DataFrame, DataFrame]:
    """(committable, held): a group with ANY errored row contributes all
    of its rows to ``held`` (for wholesale re-queue, the reference's
    fail-fast) and none to ``committable``.

    ``results`` is a fetch/extract output carrying ``group_col`` (e.g.
    the crawl index) and ``error_col`` (null = success), the shape
    ``sources.transport`` produces.

    A null group key means "no group": such a row is its own unit of
    work (committable iff it itself succeeded). They are split out
    explicitly because null never equi-joins — routing them through the
    anti/semi pair would commit errored null-key rows and lose them from
    ``held``, breaking both fail-fast and row conservation.
    """
    null_rows = results.filter(F.col(group_col).isNull())
    grouped = results.filter(F.col(group_col).isNotNull())
    failed = (
        grouped.filter(F.col(error_col).isNotNull())
        .select(group_col).distinct()
    )
    committable = grouped.join(failed, group_col, "left_anti").unionByName(
        null_rows.filter(F.col(error_col).isNull()))
    held = grouped.join(failed, group_col, "left_semi").unionByName(
        null_rows.filter(F.col(error_col).isNotNull()))
    return committable, held
