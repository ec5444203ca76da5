"""Custom stateful streaming operators (applyInPandasWithState).

Two operators a continuous ingestion pipeline needs that tumbling windows
can't express:

* running_host_quality — per-host RUNNING totals (docs seen, docs kept,
  keep rate) across the whole stream lifetime, emitted after every
  micro-batch the host appears in. State per host: two counters.
* streaming_dedup_exact — cross-batch exact dedup: only the first
  occurrence of each text fingerprint survives. (Spark's native
  dropDuplicates needs a watermark column to bound state; this variant keeps
  explicit per-fingerprint state and demonstrates the custom-state path.)

State-size posture: running_host_quality holds O(hosts) counters;
streaming_dedup_exact holds O(distinct fingerprints) in its exact
(ttl_minutes=None) mode — at web scale pass ttl_minutes to TTL-evict idle
fingerprints (ProcessingTimeTimeout), bounding state to the active window,
or prefer the batch dedup over closed partitions.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cloud_data_quality_spark.functions.text import fingerprint
from cloud_data_quality_spark.functions.webtext_rules import (
    quality_annotations_batch,
)

HOST_STATE_SCHEMA = "n_docs bigint, n_kept bigint"
HOST_OUT_SCHEMA = "host string, n_docs bigint, n_kept bigint, keep_rate double"


def _host_quality_fn(key: Tuple[str], batches: Iterable[pd.DataFrame],
                     state: GroupState):
    n_docs, n_kept = state.get if state.exists else (0, 0)
    for pdf in batches:
        ann = quality_annotations_batch(pdf["text"], with_perplexity=False)
        n_docs += len(pdf)
        n_kept += int(ann["keep"].sum())
    state.update((n_docs, n_kept))
    yield pd.DataFrame({"host": [key[0]], "n_docs": [n_docs],
                        "n_kept": [n_kept],
                        "keep_rate": [n_kept / n_docs if n_docs else 0.0]})


def running_host_quality(stream_df: DataFrame,
                         url_col: str = "url") -> DataFrame:
    from cloud_data_quality_spark.functions.skew import url_host
    hosts = stream_df.withColumn("host", url_host(F.col(url_col)))
    return (hosts.groupBy("host")
            .applyInPandasWithState(_host_quality_fn,
                                    outputStructType=HOST_OUT_SCHEMA,
                                    stateStructType=HOST_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


DEDUP_STATE_SCHEMA = "seen boolean"
DEDUP_OUT_SCHEMA = ("url string, warc_ts timestamp, text string, "
                    "lang string, fp string")


def _dedup_fn(key: Tuple[str], batches: Iterable[pd.DataFrame],
              state: GroupState):
    if state.exists:
        # fingerprint already emitted in an earlier batch — drop everything
        for _ in batches:
            pass
        return
    first = None
    for pdf in batches:
        if first is None and len(pdf):
            first = pdf.iloc[[0]]
    state.update((True,))
    if first is not None:
        yield first[["url", "warc_ts", "text", "lang", "fp"]]


def _dedup_ttl_fn(ttl_ms: int):
    """TTL-bounded variant: per-fingerprint state is dropped after ttl_ms of
    inactivity (ProcessingTimeTimeout), so total state is O(fingerprints seen
    within one TTL window), not O(all distinct fingerprints ever). Trade-off,
    stated: a duplicate arriving later than TTL after its last sighting is
    re-emitted — dedup is exact only within the window, which is the standard
    bounded-state contract (same shape as dropDuplicates + watermark)."""
    def fn(key: Tuple[str], batches: Iterable[pd.DataFrame],
           state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        first = None
        for pdf in batches:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        state.update((True,))
        state.setTimeoutDuration(ttl_ms)  # sliding: refreshed on every sight
        if not seen and first is not None:
            yield first[["url", "warc_ts", "text", "lang", "fp"]]
    return fn


def streaming_dedup_exact(stream_df: DataFrame,
                          text_col: str = "text",
                          ttl_minutes: float | None = None) -> DataFrame:
    """First occurrence per normalized-text fingerprint across the stream.

    ttl_minutes=None keeps state forever (exact over the stream lifetime —
    only viable when distinct fingerprints fit executor memory).
    ttl_minutes=N bounds state to the active window: at web scale this is
    the required mode (10^12 docs would otherwise accumulate 10^12 state
    rows).

    Trigger constraint: TTL mode needs a continuous trigger
    (processingTime=...). Trigger.AvailableNow never terminates under
    ProcessingTimeTimeout — FlatMapGroupsWithState reports
    shouldRunAnotherBatch=true whenever processing-time timers are enabled,
    so the drain-and-stop trigger schedules empty batches forever. That is
    fine for the intended deployment (TTL only matters on long-running
    streams); batch-style drains should use ttl_minutes=None."""
    keyed = stream_df.withColumn("fp", fingerprint(F.col(text_col))) \
                     .where(F.col("fp").isNotNull())
    if ttl_minutes is None:
        fn, conf = _dedup_fn, GroupStateTimeout.NoTimeout
    else:
        fn = _dedup_ttl_fn(int(ttl_minutes * 60_000))
        conf = GroupStateTimeout.ProcessingTimeTimeout
    return (keyed.groupBy("fp")
            .applyInPandasWithState(fn,
                                    outputStructType=DEDUP_OUT_SCHEMA,
                                    stateStructType=DEDUP_STATE_SCHEMA,
                                    outputMode="append",
                                    timeoutConf=conf))


QUOTA_STATE_SCHEMA = "n_emitted bigint"


def _quota_fn(max_per_host: int, order_col: str, out_cols: list):
    def fn(key: Tuple[str], batches: Iterable[pd.DataFrame],
           state: GroupState):
        n = state.get[0] if state.exists else 0
        # collect the WHOLE group before sorting: batches arrives as Arrow
        # chunks whose boundaries depend on shuffle order — chunk-local
        # sorting would make the admitted set replay-dependent
        parts = [pdf for pdf in batches if len(pdf)]
        if parts and n < max_per_host:
            group = (pd.concat(parts) if len(parts) > 1 else parts[0]) \
                .sort_values(order_col)
            take = group.iloc[:max_per_host - n]
            n += len(take)
            if len(take):
                yield take[out_cols]
        state.update((n,))
    return fn


def streaming_host_quota(stream_df: DataFrame, max_per_host: int,
                         url_col: str = "url") -> DataFrame:
    """Streaming twin of hosts.cap_per_host: admit at most max_per_host
    documents per URL host across the WHOLE stream lifetime (within-batch
    order: url_col ascending over the full micro-batch group —
    deterministic given batch boundaries). Output schema = input columns
    + `host` (derived, not hardcoded — works on any url-carrying stream).

    State per host: ONE counter (bigint) — O(hosts) total regardless of
    corpus size, so unlike streaming_dedup_exact this needs no TTL at web
    scale; a quota must remember every host it has admitted forever by
    definition. The batch cap_per_host ranks retroactively (keeps the
    lowest-ordered rows corpus-wide); the streaming quota admits first-come
    — the standard ingest-time semantics when you can't rank the future.

    Memory: the per-group concat holds ONE host's share of one micro-batch
    (bounded by trigger size), not stream history."""
    if max_per_host <= 0:
        raise ValueError("max_per_host must be positive")
    from cloud_data_quality_spark.functions.hosts import url_host
    keyed = stream_df.withColumn("host", url_host(F.col(url_col)))
    out_schema = keyed.schema
    out_cols = [f.name for f in out_schema.fields]
    return (keyed.groupBy("host")
            .applyInPandasWithState(
                _quota_fn(max_per_host, url_col, out_cols),
                outputStructType=out_schema,
                stateStructType=QUOTA_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


REVISION_STATE_SCHEMA = "best_ts bigint, best_id bigint, n_revisions bigint"
REVISION_OUT_SCHEMA = ("canon_url string, doc_id bigint, warc_ts bigint, "
                       "n_revisions bigint")


def _revision_fn(ts_col: str, id_col: str):
    def fn(key: Tuple[str], batches: Iterable[pd.DataFrame],
           state: GroupState):
        best_ts, best_id, n = state.get if state.exists else (None, None, 0)
        parts = [pdf for pdf in batches if len(pdf)]
        if parts:
            g = pd.concat(parts) if len(parts) > 1 else parts[0]
            n += len(g)
            mx = g[ts_col].max()
            cand = int(g.loc[g[ts_col] == mx, id_col].min())
            if (best_ts is None or mx > best_ts
                    or (mx == best_ts and cand < best_id)):
                best_ts, best_id = int(mx), cand
            state.update((best_ts, best_id, n))
            yield pd.DataFrame({"canon_url": [key[0]], "doc_id": [best_id],
                                "warc_ts": [best_ts], "n_revisions": [n]})
    return fn


def streaming_latest_revision(stream_df: DataFrame, url_col: str = "url",
                              ts_col: str = "warc_ts",
                              id_col: str = "doc_id") -> DataFrame:
    """Streaming twin of hosts.latest_revision: per canonical URL, the
    newest capture seen so far (tie: smallest id), re-emitted in UPDATE
    mode whenever new revisions for the URL arrive. Downstream sinks
    upsert on canon_url, converging to the batch operator's answer over
    the same rows — that equivalence is pytest-pinned.

    State per URL: (best_ts, best_id, n_revisions) — three bigints, a
    POINTER to the winner rather than its payload, so state size is
    O(urls)·24B no matter how large documents are; consumers join the
    winner ids back against durable storage. ts must be integral (epoch)
    in the streaming variant: the state schema is concrete, and integer
    comparisons sidestep Arrow timestamp-unit coercion in state replay."""
    from cloud_data_quality_spark.functions.hosts import canonicalize_url
    keyed = stream_df.withColumn("canon_url",
                                 canonicalize_url(F.col(url_col)))
    return (keyed.groupBy("canon_url")
            .applyInPandasWithState(
                _revision_fn(ts_col, id_col),
                outputStructType=REVISION_OUT_SCHEMA,
                stateStructType=REVISION_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
