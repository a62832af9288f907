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
