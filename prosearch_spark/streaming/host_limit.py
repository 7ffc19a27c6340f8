"""Stateful per-host admission control across micro-batches.

The reference enforces a per-host page limit with in-memory counters
restored from SQL on startup (Manager.java:66,209-229,336-349 — A7 +
P3): once a host has 10,000 indexed pages, further references are
rejected, across crawl sessions. The streaming re-expression is a
keyed-state operator: ``applyInPandasWithState`` keeps a running count
per host; each micro-batch admits only rows while the host is under
its limit, deterministically by (doc_id) order within the batch.

This is the repo's custom-stateful-operator template: GroupState with
a tiny numeric payload, Arrow-batched group kernels, no timeouts (the
count never expires — matching the reference, where only a recrawl
resets counts via the processed->cached rename).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count LONG"


def _admit(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (count,) = state.get if state.exists else (0,)
    # buffer the whole group's chunks BEFORE sorting: admission must be
    # deterministic by doc_id across the entire micro-batch, not per
    # Arrow chunk (chunk boundaries depend on upstream partitioning)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        state.update((count,))
        return
    all_rows = pd.concat(chunks).sort_values("doc_id", kind="mergesort")
    limit = int(all_rows["_limit"].iloc[0])
    room = max(0, limit - count)
    take = all_rows.head(room)
    state.update((count + len(take),))
    if len(take):
        yield take.drop(columns=["_limit"])


def admitted_stream(stream, host_col: str, limit: int,
                    output_schema: str):
    """Admit at most ``limit`` rows per host across ALL micro-batches.

    ``output_schema`` must match the input columns minus the internal
    ``_limit`` column (DDL string).
    """
    from pyspark.sql import functions as F

    keyed = stream.withColumn("_limit", F.lit(limit)).groupBy(host_col)
    return keyed.applyInPandasWithState(
        _admit,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
