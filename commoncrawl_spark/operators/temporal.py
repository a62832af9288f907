"""Temporal joins over capture histories.

A crawl's CDX index is a (url, timestamp) capture history; two questions
recur that plain equi-joins cannot answer:

- "what was the newest capture of each URL as of time T?" — table
  time-travel against the capture log (the reference's best-capture fold
  is the T = +inf special case, download_and_merge.py:198-209);
- "for each fetch/event, which capture was current at that moment?" —
  the AS-OF join (backward, inclusive), which Spark has no native
  operator for.

Both are built from shuffle-once DataFrame compositions — no Python, no
windows wider than one partition pass:

- ``latest_as_of`` is filter + ``max_by`` (map-side partial aggregate —
  the same single-shuffle shape as the dedup fold);
- ``asof_join`` is the union-merge pattern: tag both sides, hash-
  partition by key, one per-partition sort on (ts, side), then a
  running ``last(payload, ignorenulls=True)`` propagates the most
  recent right payload onto each left row. One exchange per side, one
  sort, zero Python — the merge-join shape a 100 TB capture log needs.
  Skew note: a single hot key serializes its own history into one
  partition's sort, like any merge join; beyond-RAM keys would need
  time-range chunking with boundary replication, documented out of
  scope here.

DuckDB's native ``ASOF JOIN`` is the oracle (query ``asof_capture``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def latest_as_of(
    captures: DataFrame,
    as_of,
    key_col: str = "url",
    ts_col: str = "timestamp",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Newest capture per key with ``ts_col <= as_of`` — capture-log
    time travel. ``as_of`` is a Column or literal comparable to
    ``ts_col``. Keys with no capture by then are absent (they did not
    exist at T). ``tiebreak_cols`` order same-timestamp captures
    deterministically (e.g. a capture id). Single shuffle, map-side-
    partial ``max_by``."""
    eligible = captures.filter(F.col(ts_col) <= F.lit(as_of))
    payload = F.struct(*[c for c in captures.columns if c != key_col])
    order = F.struct(F.col(ts_col), *[F.col(c) for c in tiebreak_cols])
    return (
        eligible.groupBy(key_col)
        .agg(F.max_by(payload, order).alias("_latest"))
        .select(key_col, "_latest.*")
    )


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based session assignment: a new session starts whenever the
    time since the key's previous event exceeds ``gap_seconds``. The session id
    is ``<key>#<n>`` with ``n`` the 0-based session ordinal per key —
    deterministic given distinct (key, ts) pairs.

    For a crawl this segments fetch bursts per host (politeness-budget
    accounting, ST1's pacing analysis); for web events it is the classic
    session cut. Plan: one hash exchange on the key, one per-partition
    sort, then lag + running sum — the same single-shuffle shape as any
    window aggregate, no Python. (The streaming equivalent with state
    timeouts lives in ``streaming.stateful``; Spark's native
    ``session_window`` gives windows, not joinable ordinals, which is
    why this composition exists.)
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # microsecond precision for timestamps — a seconds cast truncates,
    # and a fractional gap straddling the threshold must cut the same
    # way here and in any SQL engine. timestamp_diff covers both
    # TIMESTAMP and TIMESTAMP_NTZ (parquet defaults to NTZ) without a
    # session-timezone-dependent epoch conversion.
    if isinstance(df.schema[ts_col].dataType,
                  (TimestampType, TimestampNTZType)):
        delta = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
        gap_lit = F.lit(int(gap_seconds) * 1_000_000)
    else:
        delta = F.col(ts_col).cast("long") - prev.cast("long")
        gap_lit = F.lit(gap_seconds)
    is_new = (prev.isNull() | (delta > gap_lit)).cast("long")
    ordinal = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1
    return df.withColumn(
        out_col,
        F.concat(F.col(key_col).cast("string"), F.lit("#"),
                 ordinal.cast("string")),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward (inclusive) as-of join: every ``left`` row gains the
    ``right`` row with the largest ``right_ts <= left_ts`` for the same
    ``on`` key — nulls when no such row exists (left-outer semantics).

    ``right_cols`` (default: all non-key, non-ts columns) arrive
    prefixed; ``right_ts`` arrives as ``<prefix><right_ts>``. Rows of
    ``right`` sharing an identical (key, ts) are tie-broken by the
    payload struct's ordering, deterministically.

    Matches DuckDB ``l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    pay_fields = [F.col(right_ts).alias(f"{prefix}{right_ts}")] + [
        F.col(c).alias(f"{prefix}{c}") for c in right_cols
    ]
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*pay_fields).alias("_pay"),
    )
    # identical (key, ts) right rows: keep the struct-max payload so the
    # propagated value is deterministic regardless of partition order
    r = r.groupBy(on, "_ts", "_side").agg(F.max("_pay").alias("_pay"))
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
    )
    u = r.unionByName(l, allowMissingColumns=True)
    # right rows sort before left rows at equal ts => inclusive match
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cols = left.columns + [
        F.col(f"_m.{prefix}{right_ts}").alias(f"{prefix}{right_ts}")
    ] + [F.col(f"_m.{prefix}{c}").alias(f"{prefix}{c}") for c in right_cols]
    return (
        u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(*out_cols)
    )


def capture_change_stats(
    captures: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key change statistics from a capture history — the input to
    adaptive recrawl scheduling (Cho & Garcia-Molina, "Estimating
    Frequency of Change", TOIT 2003). For every key: how many captures,
    how many of the consecutive-capture transitions changed the content
    digest, over what time span.

    Output: ``(key_col, n_captures, n_changes, first_ts, last_ts,
    change_rate_per_day)`` where the rate is the bias-corrected Poisson
    estimator  ``-ln((m - x + 0.5) / (m + 0.5)) / avg_interval_days``
    (m = intervals, x = changed intervals) — finite even when every
    interval changed, null when there is only one capture (no interval
    evidence). Digest comparison is null-safe; equal-timestamp captures
    are ordered by ``tiebreak_cols`` so the lag is deterministic.

    Plan: one hash exchange on the key + per-partition sort (the lag),
    then a groupBy on the SAME key — Spark reuses the window's
    partitioning, so the whole operator is a single shuffle, no Python.
    ``ts_col`` may be TIMESTAMP/TIMESTAMP_NTZ (microsecond-exact
    intervals via timestamp_diff) or numeric (epoch seconds).
    """
    w = Window.partitionBy(key_col).orderBy(
        ts_col, *[F.col(c) for c in tiebreak_cols])
    prev = F.lag(F.col(digest_col)).over(w)
    # row_number (not prev IS NOT NULL) marks the first capture — a null
    # digest is a legitimate value and null -> value must count as change
    rn = F.row_number().over(w)
    changed = (
        (rn > 1) & ~F.col(digest_col).eqNullSafe(prev)
    ).cast("long")
    stats = (
        captures.select(
            key_col, ts_col, changed.alias("_changed"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.sum("_changed").alias("n_changes"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
    )
    if isinstance(captures.schema[ts_col].dataType,
                  (TimestampType, TimestampNTZType)):
        span_days = (
            F.timestamp_diff("MICROSECOND", F.col("first_ts"),
                             F.col("last_ts")).cast("double")
            / F.lit(86400.0 * 1e6)
        )
    else:
        span_days = (
            F.col("last_ts").cast("double") - F.col("first_ts").cast("double")
        ) / F.lit(86400.0)
    m = (F.col("n_captures") - 1).cast("double")
    x = F.col("n_changes").cast("double")
    avg_interval_days = span_days / m
    rate = F.when(
        (F.col("n_captures") > 1) & (span_days > 0),
        F.round(
            -F.log((m - x + 0.5) / (m + 0.5)) / avg_interval_days, 6),
    )
    return stats.withColumn("change_rate_per_day", rate)


def recrawl_schedule(
    stats: DataFrame,
    as_of,
    default_rate_per_day: float = 0.1,
    ts_col: str = "last_ts",
) -> DataFrame:
    """Recrawl priority from change statistics: the probability each key
    has changed since its last capture, ``p_changed = 1 - exp(-rate *
    age_days)`` under the Poisson change model — the freshness-greedy
    crawl order is descending ``p_changed``. Keys with no rate evidence
    (single capture) assume ``default_rate_per_day``. Adds
    ``age_days`` (rounded to 6, as-of ``as_of`` minus last capture) and
    ``p_changed`` (rounded to 6). Pure column arithmetic — no shuffle
    beyond what produced ``stats``."""
    ts_type = stats.schema[ts_col].dataType
    if isinstance(ts_type, (TimestampType, TimestampNTZType)):
        age = (
            F.timestamp_diff("MICROSECOND", F.col(ts_col),
                             F.lit(as_of).cast(ts_type))
            .cast("double") / F.lit(86400.0 * 1e6)
        )
    else:
        age = (F.lit(as_of).cast("double")
               - F.col(ts_col).cast("double")) / F.lit(86400.0)
    rate = F.coalesce(
        F.col("change_rate_per_day"), F.lit(default_rate_per_day))
    return (
        stats.withColumn("age_days", F.round(age, 6))
        .withColumn(
            "p_changed",
            F.round(1 - F.exp(-rate * F.greatest(age, F.lit(0.0))), 6),
        )
    )


def snapshot_diff(
    captures: DataFrame,
    as_of_old,
    as_of_new,
    key_col: str = "url",
    ts_col: str = "timestamp",
    compare_cols: Sequence[str] = (),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """What changed in the capture log between two cutoffs: per key,
    compare ``latest_as_of(as_of_old)`` with ``latest_as_of(as_of_new)``
    and classify ``added`` (key absent at T_old), ``removed`` (present
    at T_old, absent at T_new — only possible with retractions, kept for
    generality), ``changed`` (any ``compare_cols`` differs, null-safe),
    or ``unchanged``. Output: ``key_col, change, old_<c>..., new_<c>...``
    (flattened, so the frame is directly joinable/writable).

    The incremental-recrawl planner's core question — "which URLs gained
    a newer capture since the last harvest" — is ``change IN ('added',
    'changed')``. Plan: two single-shuffle max_by folds over the same
    scan + one full-outer merge join on the key; no Python, no window
    sort."""
    if not compare_cols:
        compare_cols = [c for c in captures.columns
                        if c not in (key_col, ts_col)]
    old = latest_as_of(captures, as_of_old, key_col, ts_col, tiebreak_cols)
    new = latest_as_of(captures, as_of_new, key_col, ts_col, tiebreak_cols)
    old = old.select(
        key_col, F.lit(True).alias("_has_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols])
    new = new.select(
        key_col, F.lit(True).alias("_has_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols])
    j = old.join(new, key_col, "full_outer")
    differs = None
    for c in compare_cols:
        d = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        differs = d if differs is None else (differs | d)
    change = (
        F.when(F.col("_has_old").isNull(), F.lit("added"))
        .when(F.col("_has_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        key_col, change.alias("change"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def revisit_records(
    captures: DataFrame,
    prior: DataFrame | None = None,
    url_col: str = "url",
    digest_col: str = "digest",
    ts_col: str = "timestamp",
    tiebreak_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Digest-based capture dedup in the Common Crawl / Heritrix WARC
    shape: a capture whose payload digest was already stored becomes a
    ``revisit`` record pointing at the original instead of storing the
    bytes again — at web scale most recrawled pages are unchanged, so
    this is the single biggest storage saver a crawl archive has.

    Classification per capture:
    - its (url, digest) exists in ``prior`` (originals stored by earlier
      snapshots) -> ``revisit`` referring to the prior original's
      timestamp — even the batch-earliest capture, the bytes are
      already archived;
    - else the lexicographically earliest (ts, *tiebreaks) capture of
      each (url, digest) group is the ``response`` (new original) and
      every later same-digest capture is a ``revisit`` referring to it;
    - a changed digest is simply a new group -> new ``response``.

    ``prior`` needs columns (url, digest, ts) — e.g. the output of this
    function filtered to responses, or ``latest_as_of`` folds per
    (url, digest). Returns ``captures`` plus ``record_type`` and
    ``refers_to_ts`` (NULL on responses).

    Scale shape: one map-side-partial min(struct) aggregate plus two
    equi-joins, all on the same (url, digest) key — co-partitioned under
    AQE, no windows, no Python. The revisit pointer is carried as a
    timestamp, not bytes; payloads for revisits never move at all.
    """
    key = [url_col, digest_col]
    tb = list(tiebreak_cols)
    orig_struct = F.min(F.struct(ts_col, *tb)).alias("_orig")
    batch_orig = captures.groupBy(*key).agg(orig_struct).select(
        *key,
        F.col(f"_orig.{ts_col}").alias("_first_ts"),
        *[F.col(f"_orig.{c}").alias(f"_first_{c}") for c in tb],
    )
    out = captures.join(batch_orig, key)
    if prior is not None:
        p = prior.select(
            F.col(url_col), F.col(digest_col),
            F.col(ts_col).alias("_prior_ts"),
        ).groupBy(*key).agg(F.min("_prior_ts").alias("_prior_ts"))
        out = out.join(p, key, "left")
    else:
        ts_type = captures.schema[ts_col].dataType
        out = out.withColumn("_prior_ts", F.lit(None).cast(ts_type))
    is_first = (F.col(ts_col) == F.col("_first_ts"))
    for c in tb:
        is_first = is_first & (F.col(c) == F.col(f"_first_{c}"))
    rec_type = (
        F.when(F.col("_prior_ts").isNotNull(), F.lit("revisit"))
        .when(is_first, F.lit("response"))
        .otherwise(F.lit("revisit"))
    )
    refers = (
        F.when(F.col("_prior_ts").isNotNull(), F.col("_prior_ts"))
        .when(is_first, F.lit(None).cast(captures.schema[ts_col].dataType))
        .otherwise(F.col("_first_ts"))
    )
    return out.select(
        *captures.columns,
        rec_type.alias("record_type"),
        refers.alias("refers_to_ts"),
    )


def revalidation_plan(
    frontier: DataFrame,
    p_col: str = "p_changed",
    bytes_col: str = "content_length",
    etag_col: str = "etag",
    last_modified_col: str = "last_modified",
    overhead_bytes: int = 600,
) -> DataFrame:
    """Conditional-GET planning for the recrawl frontier: per URL,
    which HTTP validator to send and what the refetch is expected to
    cost. A page whose server returned an ``ETag`` revalidates with
    ``If-None-Match`` (the strong validator, RFC 9110 §8.8.3); one with
    only ``Last-Modified`` uses ``If-Modified-Since``; one with neither
    must be fetched unconditionally. When the content is unchanged
    (probability ``1 - p_changed`` from :func:`recrawl_schedule`), a
    validated request costs only the ~``overhead_bytes`` of a 304
    exchange instead of the full body — at web scale most pages don't
    change between visits, so this is the dominant bandwidth lever a
    polite recrawler has.

    Adds ``validator`` ('etag' | 'last-modified' | 'none'),
    ``expected_bytes`` = ``p*body + (1-p)*(overhead if validator else
    body)``, and ``saved_bytes`` = the expectation saved vs an
    unconditional fetch (0 for validator-less URLs; never negative —
    bodies smaller than the overhead fetch unconditionally and save 0).
    Both rounded to 6dp (the engine's cross-engine float convention).

    Pure column arithmetic over the frontier scan — no shuffle, no
    Python; aggregate per host downstream to budget bandwidth.
    """
    p = F.col(p_col).cast("double")
    body = F.col(bytes_col).cast("double")
    has_etag = F.col(etag_col).isNotNull() & (F.col(etag_col) != "")
    has_lm = (F.col(last_modified_col).isNotNull()
              & (F.col(last_modified_col) != ""))
    validator = (
        F.when(has_etag, F.lit("etag"))
        .when(has_lm, F.lit("last-modified"))
        .otherwise(F.lit("none"))
    )
    # a 304 cheaper than the body is the only case worth a validator
    worthwhile = (validator != "none") & (body > F.lit(float(overhead_bytes)))
    expected = F.when(
        worthwhile,
        p * body + (F.lit(1.0) - p) * F.lit(float(overhead_bytes)),
    ).otherwise(body)
    return (
        frontier.withColumn("validator", validator)
        .withColumn("expected_bytes", F.round(expected, 6))
        .withColumn(
            "saved_bytes",
            F.round(body - expected, 6))
    )
