"""CDX dedup-reduce: pick the best capture per canonical URL.

Reference semantics (``choose_better_record``, download_and_merge.py:198-209,
identical copies at cc_merge_indexes.py:165-176 and
main_merge_and_deduplicate.py:22-40) — a pairwise fold over arrival order:

  1. status == "200" beats any other status
  2. "html" in lower(mime-detected or "") beats not
  3. NEW wins if int(new.length) > int(old.length)   (ValueError -> skip)
  4. NEW wins if new.timestamp > old.timestamp       (string compare)
  5. otherwise keep the OLD record

Criteria 3-4 make this a genuine *fold*, not a max-by: a later record wins
by beating the running winner on EITHER length OR timestamp, so e.g.
arrival [(len 5, ts 1), (len 9, ts 0), (len 2, ts 3)] ends on the third
record even though it is neither longest nor the max composite key. No
window sort expresses that; the engine therefore reproduces the fold
exactly and JVM-side: ``collect_list(struct) -> array_sort (arrival order)
-> aggregate(...)`` with the pairwise comparator as a Catalyst CASE chain.
One hash shuffle on the canonical key (uniform even for a single-host
corpus — the key includes the path); per-group arrays are tiny (captures
per URL <= #crawls, ~114 at CC scale), so collect_list is safe at 10^10
URLs.

``arrival_seq`` is the deterministic input order (crawl_rank, page,
line_no) — the sorted-variant semantics of main_merge_and_deduplicate.py:78,
replacing the unsorted os.listdir of download_and_merge.py:232.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url_col

BEST_CAPTURE_ORDER_DOC = "(is200 desc, is_html desc, length desc nulls last, timestamp desc, arrival asc)"


def with_canonical_url(df: DataFrame, url_col: str = "url",
                       out_col: str = "canon_url") -> DataFrame:
    """A1: attach the canonical-URL dedup key (pure Catalyst, codegen'd)."""
    return df.withColumn(out_col, canonicalize_url_col(F.col(url_col)))


def _choose_better_col(acc, x):
    """The pairwise comparator over PRE-COMPUTED fields (_is200/_is_html/
    _len/_ts are derived once per record before the shuffle — the fold is
    interpreted per comparison, so keeping try_cast/lower/contains out of
    it is a ~3x win). Null semantics exactly as the reference's .get()
    defaults make them."""
    return (
        F.when(~acc["_is200"] & x["_is200"], x)
        .when(acc["_is200"] & ~x["_is200"], acc)
        .when(acc["_is_html"] & ~x["_is_html"], acc)
        .when(~acc["_is_html"] & x["_is_html"], x)
        .when(
            acc["_len"].isNotNull() & x["_len"].isNotNull()
            & (x["_len"] > acc["_len"]),
            x,
        )
        .when(x["_ts"] > acc["_ts"], x)
        .otherwise(acc)
    )


def best_capture_per_url(
    cdx: DataFrame,
    arrival_cols: Sequence[str] = ("crawl", "page", "line_no"),
    url_col: str = "url",
) -> DataFrame:
    """A2: one winner per canonical URL, exact fold semantics.

    groupBy(canon_url) -> collect_list(struct) -> array_sort (structs sort
    lexicographically, so arrival columns lead and the unique arrival
    prefix is all the comparator ever reads) -> aggregate() fold with the
    reference comparator. Entirely JVM expressions — no UDF, no window
    sort. One hash shuffle; the original record rides as a nested payload
    struct so nothing is recomputed or re-joined afterwards.
    """
    df = with_canonical_url(cdx, url_col)
    rec_cols = [c for c in df.columns if c != "canon_url"]
    fields = (
        [F.col(c) for c in arrival_cols]
        + [
            (F.coalesce(F.col("status"), F.lit("")) == "200").alias("_is200"),
            F.lower(F.coalesce(F.col("mime_detected"), F.lit("")))
            .contains("html").alias("_is_html"),
            # int(rec.get("length", 0)): missing -> 0, unparseable -> null
            # (fold skips the length criterion on null, like the reference's
            # swallowed ValueError)
            F.coalesce(F.col("length"), F.lit("0")).try_cast("long").alias("_len"),
            F.coalesce(F.col("timestamp"), F.lit("")).alias("_ts"),
            F.struct(*[F.col(c) for c in rec_cols]).alias("_rec"),
        ]
    )
    arr = F.array_sort(F.collect_list(F.struct(*fields)))
    folded = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1),
        _choose_better_col,
    ).alias("_w")
    return (
        df.groupBy("canon_url")
        .agg(folded)
        .select("canon_url", *[F.col(f"_w._rec.{c}").alias(c) for c in rec_cols])
        .select(*rec_cols, "canon_url")
    )


def dedup_first_seen(
    df: DataFrame,
    key_cols: Sequence[str],
    arrival_cols: Sequence[str],
) -> DataFrame:
    """A3: exact-key first-wins dedup (cc_merge_indexes copy.py:33-38) —
    keep the earliest-arriving record per key.

    min_by, not a row_number window: the window would shuffle every
    column of every row and sort within each key; min_by partial-
    aggregates map-side, so the exchange carries one pre-reduced record
    per (partition, key). arrival_seq is unique by construction (§3 of
    SURVEY.md), so the winner is deterministic."""
    rec_cols = list(df.columns)
    best = F.min_by(
        F.struct(*[F.col(c) for c in rec_cols]),
        F.struct(*[F.col(c) for c in arrival_cols]),
    ).alias("_first")
    return (
        df.groupBy(*key_cols)
        .agg(best)
        .select(*[F.col(f"_first.{c}").alias(c) for c in rec_cols])
    )


def merge_incremental(
    existing: DataFrame,
    new_batch: DataFrame,
    arrival_cols: Sequence[str] = ("crawl", "page", "line_no"),
) -> DataFrame:
    """A4: fold a new batch into an existing deduped set — the reference's
    batched out-of-core dedup (main_merge_and_deduplicate.py:42-102) becomes
    union + one shuffle dedup; Spark's hash agg spills, so no manual
    batching is needed. Incremental snapshots come from the table layer."""
    return best_capture_per_url(
        existing.unionByName(new_batch, allowMissingColumns=True), arrival_cols
    )


# ---------------------------------------------------------------------------
# Pure-Python oracle (pairwise fold, verbatim reference semantics) for tests
# ---------------------------------------------------------------------------

def choose_better_record_py(old: dict, new: dict) -> dict:
    if old.get("status") != "200" and new.get("status") == "200":
        return new
    if old.get("status") == "200" and new.get("status") != "200":
        return old
    old_html = "html" in (old.get("mime_detected", "") or "").lower()
    new_html = "html" in (new.get("mime_detected", "") or "").lower()
    if old_html and not new_html:
        return old
    if not old_html and new_html:
        return new
    # DataFrame convention: SQL NULL == missing key == 0 (the reference's
    # dict .get("length", 0)); only an unparseable string skips the
    # criterion (the reference's swallowed ValueError). A dict carrying an
    # explicit None is treated as missing, matching the engine's coalesce.
    try:
        old_len = int(old.get("length") if old.get("length") is not None else 0)
        new_len = int(new.get("length") if new.get("length") is not None else 0)
        if new_len > old_len:
            return new
    except ValueError:
        pass
    if (new.get("timestamp", "") or "") > (old.get("timestamp", "") or ""):
        return new
    return old


def deduplicate_records_py(records, canonicalize) -> dict[str, dict]:
    """Fold in arrival order (download_and_merge.py:211-221)."""
    unique: dict[str, dict] = {}
    for rec in records:
        url = rec.get("url")
        if not url:
            continue
        key = canonicalize(url)
        if key in unique:
            unique[key] = choose_better_record_py(unique[key], rec)
        else:
            unique[key] = rec
    return unique
