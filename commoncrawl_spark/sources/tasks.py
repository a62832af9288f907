"""Task fan-out: index list -> one fetch task per CDX index page (S7).

The reference's entry point #1 (create_tasks.py) probes each crawl index
for its page count (``showNumPages=true``, create_tasks.py:30-55) and
fans out one task record ``{index, page, url}`` per page
(create_tasks.py:85-91; shipped shape in tasks.jsonl), skipping indexes
already in the processed set (create_tasks.py:62-66).

Engine shape: the probe is an HTTP concern that belongs to a transport
(one metadata GET per index — driver-side or a tiny mapInPandas; either
way it is O(#indexes) ~ hundreds, never a scale problem). The fan-out is
pure Catalyst: ``explode(sequence(0, pages-1))`` — a generated column,
no Python, no shuffle — so a 114-crawl x ~thousands-of-pages index list
expands executor-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_API_BASE = "https://index.commoncrawl.org"


def tasks_from_indexes(
    indexes: DataFrame,
    target_url: str,
    api_base: str = DEFAULT_API_BASE,
    processed: DataFrame | None = None,
    index_col: str = "index",
    pages_col: str = "pages",
) -> DataFrame:
    """``indexes(index, pages)`` -> ``tasks(index, page, url)``.

    ``processed`` (optional, any frame with an ``index`` column) is the
    resume set: already-harvested indexes yield no tasks (anti-join, the
    reference's processed-set skip). Indexes with ``pages <= 0`` yield no
    tasks. The task URL mirrors the reference's CDX-API request shape
    (create_tasks.py:86-91): ``{api_base}/{index}-index?url={target}
    &output=json&page={page}``.
    """
    t = indexes.select(F.col(index_col).alias("index"),
                       F.col(pages_col).cast("int").alias("pages"))
    if processed is not None:
        t = t.join(processed.select("index").distinct(), "index", "left_anti")
    fanned = (
        t.filter(F.col("pages") > 0)
        .select(
            "index",
            F.explode(F.sequence(F.lit(0), F.col("pages") - 1)).alias("page"),
        )
    )
    url = F.concat(
        F.lit(api_base + "/"), F.col("index"), F.lit("-index?url="),
        F.lit(target_url), F.lit("&output=json&page="),
        F.col("page").cast("string"),
    )
    return fanned.select("index", "page", url.alias("url"))
