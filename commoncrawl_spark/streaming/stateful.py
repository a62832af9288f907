"""Custom stateful streaming operator: per-host crawl-admission control.

The reference's politeness is a sleep between requests
(fetch_guardian_fulltext.py:130) and a bounded worker pool
(download_warc_segments.py:30-32) — state that lives in one process. In
a streaming engine that state must survive across micro-batches and
executors, which is exactly what ``applyInPandasWithState`` provides:
per-group (per-host) state kept by the streaming state store,
checkpointed with the query.

``per_host_admission`` keeps ONE counter per host — URLs admitted so far
— and admits rows until the host's lifetime budget is exhausted. Excess
rows are emitted with ``admitted = false`` (never silently dropped — the
same error-side-channel discipline as extraction's F4). Scale shape: one
state row per host (millions of hosts = small state), shuffled by host —
the hot-host problem does not apply because the state value is a counter,
not the URL list.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMISSION_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("admitted", T.BooleanType()),
        T.StructField("host_admitted_total", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("n_admitted", T.LongType())])


def per_host_admission(
    stream: DataFrame,
    budget_per_host: int,
    url_col: str = "url",
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("url",),
) -> DataFrame:
    """Admit at most ``budget_per_host`` URLs per host across the whole
    stream; rows beyond the budget flow out with ``admitted = false``.

    The groupBy shuffle gives NO intra-group row order, so which rows
    consume the budget would be nondeterministic without an explicit
    ranking: each micro-batch group is therefore sorted by ``order_cols``
    (pass the frontier's priority columns; default ``url``) before
    flagging. The sort must span the WHOLE group — Spark hands a group to
    ``applyInPandasWithState`` as an iterator of Arrow chunks with
    shuffle-dependent boundaries, so a per-chunk sort would still admit a
    chunking-dependent set — hence the chunks are concatenated first.
    Memory bound: one host's rows within one micro-batch (the micro-batch
    trigger bounds it; a host's lifetime URL count never materializes)."""

    def admit(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        (n_admitted,) = state.get if state.exists else (0,)
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
                else chunks[0]
            pdf = pdf.sort_values(list(order_cols), kind="mergesort")
            urls = pdf[url_col]
            remaining = max(budget_per_host - n_admitted, 0)
            flags = [i < remaining for i in range(len(urls))]
            n_admitted += min(remaining, len(urls))
            yield pd.DataFrame(
                {
                    "host": host,
                    "url": urls.to_numpy(),
                    "admitted": flags,
                    "host_admitted_total": n_admitted,
                }
            )
        state.update((n_admitted,))

    return stream.groupBy(host_col).applyInPandasWithState(
        admit,
        outputStructType=ADMISSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts_micros", T.LongType()),
        T.StructField("session_id", T.StringType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ordinal", T.LongType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def streaming_sessionize(
    stream: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "key",
    ts_col: str = "ts_micros",
) -> DataFrame:
    """Streaming twin of ``operators.temporal.sessionize``: gap-based
    session ids (``<key>#<ordinal>``) assigned incrementally, with per-key
    state = (current ordinal, last event time) surviving micro-batches in
    the state store — 16 bytes per key, never the event history.

    ``ts_col`` is event time in MICROSECONDS (long): the batch operator
    cuts at microsecond precision and the streaming twin must agree.
    Rows inside a micro-batch are sorted by event time before the fold
    (chunks concatenated first — Arrow chunk boundaries are shuffle-
    dependent); ACROSS micro-batches rows must arrive in event-time
    order per key to match the batch result (feed from an ordered log,
    or front it with a watermark + sorted foreachBatch). Out-of-order
    arrivals never crash: a stale row joins the CURRENT session (its gap
    to ``last_ts`` is negative, which never exceeds the threshold) and
    ``last_ts`` only moves forward.

    Spark's native ``session_window`` yields window bounds, not joinable
    per-key ordinals, and cannot express keep-alive state across
    restarts at this granularity — which is why this operator exists
    (same reason as the batch twin)."""
    gap_us = int(gap_seconds) * 1_000_000

    def assign(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            ordinal, last_ts = state.get
            if last_ts < 0:  # stored sentinel for "no event yet"
                last_ts = None
        else:
            ordinal, last_ts = -1, None
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 \
                else chunks[0]
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            out_ids = []
            for ts in pdf[ts_col]:
                ts = int(ts)
                if last_ts is None or ts - last_ts > gap_us:
                    ordinal += 1
                last_ts = ts if last_ts is None else max(last_ts, ts)
                out_ids.append(f"{k}#{ordinal}")
            yield pd.DataFrame(
                {
                    "key": k,
                    "ts_micros": pdf[ts_col].to_numpy(),
                    "session_id": out_ids,
                }
            )
        state.update((ordinal, last_ts if last_ts is not None else -1))

    return stream.groupBy(key_col).applyInPandasWithState(
        assign,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_first_seen(stream: DataFrame, key_cols: list[str],
                         ts_col: str | None = None,
                         delay: str = "10 minutes") -> DataFrame:
    """Streaming twin of ``dedup.dedup_first_seen`` (A3): emit only the
    FIRST row per key across all micro-batches.

    Without ``ts_col``: exact unbounded dedup — the state store keeps one
    entry per key for the life of the query (checkpoint-durable; this is
    the streaming seen-set analog: bytes per key, hash-partitioned by the
    key like the batch generations). With ``ts_col``:
    ``dropDuplicatesWithinWatermark`` — a key's state is dropped once the
    watermark passes its event time + ``delay``, bounding state for feeds
    whose duplicates arrive within a known lateness window (the CDX
    re-publish shape; reference analog: main_merge_and_deduplicate.py's
    batched merge, which equally assumes duplicates cluster in time).

    Cross-batch semantics are strictly first-batch-wins via the state
    store. WITHIN one micro-batch Spark keeps an arbitrary row per key
    (no intra-batch arrival order exists); the batch twin's
    deterministic orderBy tie-break applies only where a total arrival
    order is defined — unordered live feeds have none.
    """
    if ts_col is None:
        return stream.dropDuplicates(list(key_cols))
    return (
        stream.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )
