"""Structured Streaming over the events table (SURVEY.md §2.7, §7).

The reference is batch-only; this module is the north-star extension:
the same event analytics the batch catalog exposes, expressed as
incremental streaming queries so they run unchanged against Kafka/
files at production scale.

* tumbling / sliding windowed aggregates with event-time watermarks;
* session windows (native ``session_window``);
* a watermarked STREAM-STREAM interval join (click→purchase
  attribution) with time-bounded state eviction;
* EVENT-TIME-timeout alerting (silent-source heartbeat monitor);
* custom stateful operators via ``applyInPandasWithState`` (running
  per-user totals, the funnel state machine, the hourly rate-spike
  detector — the pattern for any bespoke online aggregate Spark
  lacks).

Tests drive these with the parquet fixture as a bounded stream
(memory sink + ``processAllAvailable``) and assert stream/batch
equivalence where the semantics promise it.

Scale notes: watermarks bound state; session/window state is keyed by
(user, window) and distributes across executors; the Pandas-UDF
stateful path receives Arrow batches per key group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# events fixture schema: TIMESTAMP(NANOS) surfaces as TIMESTAMP_NTZ
# (PySpark ≥4.1 reads nanos natively, truncated to micros; an explicit
# BIGINT schema would expose Spark's *internal micros*, not the file's
# nanos, so NTZ is the only representation stable across versions)
EVENTS_RAW_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture as a bounded file stream. The file-stream
    source requires a directory, so read the sf dir with a glob filter
    for the events file. The TIMESTAMP(NANOS) column is declared
    TIMESTAMP_NTZ in the stream schema (PySpark ≥4.1 reads nanos
    natively, truncated to micros) and normalizes to a session-zoned
    timestamp — no legacy conf: the fixed stream schema cannot serve
    both representations, so the streaming path requires ≥4.1 (the
    batch helper handles both) and fails fast below it rather than
    surfacing an opaque runtime schema mismatch."""
    import pyspark

    from hadoop_search_spark.sources.tables import normalize_event_ts

    if tuple(int(p) for p in pyspark.__version__.split(".")[:2]) < (4, 1):
        raise RuntimeError(
            "the streaming events path requires PySpark >= 4.1 (the "
            "TIMESTAMP(NANOS) events column is only readable as "
            f"TIMESTAMP_NTZ there); running {pyspark.__version__} — "
            "use the batch reader (sources.tables) instead"
        )

    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def hourly_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour counts + value sums per event type — streaming
    twin of catalog ``events_hourly``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_error_rate(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """10-minute windows sliding every 5: error share of all events."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_err"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("win_us"),
            "n",
            "n_err",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows per user — the streaming form of the
    batch gaps-and-islands sessionization (catalog
    ``events_sessionize``)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """At-least-once-delivery dedup for an event stream: keep the
    first occurrence of each key within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state to the
    watermark window — the 100 TB-stream answer to replayed /
    re-delivered events, where an unbounded ``dropDuplicates`` state
    would grow forever. Keys default to the event id."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enriched_segment_counts(
    events: DataFrame, customers: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-static enrichment join + windowed rollup: each event is
    joined to the static customer dimension (broadcast — the static
    side is planned per micro-batch, never shuffled with the stream)
    and counted per (hour, market segment).

    The static side joins on ``user_id = c_custkey``; unmatched users
    fall into segment 'unknown' (left join) so event counts are
    conserved."""
    dim = customers.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = events.withWatermark("ts", watermark).join(
        F.broadcast(dim), "user_id", "left"
    )
    return (
        joined.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.coalesce("c_mktsegment", F.lit("unknown")).alias("segment"),
        )
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("hour_us"),
            "segment",
            "n",
            "sum_value",
        )
    )


def click_purchase_attribution(
    events: DataFrame,
    attribution_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """STREAM-STREAM interval join — the flagship stateful join shape:
    every purchase pairs with each click by the same user in the
    preceding ``attribution_minutes`` →
    ``(user_id, click_id, purchase_id, click_us, purchase_us, value)``.

    Both sides carry event-time watermarks and the join predicate
    bounds purchase_ts to [click_ts, click_ts + window], which is
    what lets Spark EVICT buffered state: a click older than
    watermark + window can never match a future purchase and is
    dropped from the state store — without the time bound the state
    grows forever. Inner join in append mode, so results are emitted
    once both sides' watermarks pass the match window (exactly-once
    under replay).

    The batch twin is the same filter+join over the full table
    (equivalence pinned in tests/test_streaming.py); the as-of
    LATEST-click variant is the batch ``events_asof_attribution``
    entry — an as-of needs per-key ordering, which stream-stream
    joins don't provide, so the streaming form is the all-pairs-in-
    window join and any latest-only reduction happens downstream.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = F.expr(
        "user_id = p_user AND purchase_ts >= click_ts "
        f"AND purchase_ts <= click_ts + interval {int(attribution_minutes)} minutes"
    )
    return clicks.join(purchases, cond).select(
        "user_id",
        "click_id",
        "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "value",
    )


RUNNING_TOTALS_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _running_totals_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful op: per-user running (count, spend)."""
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """``applyInPandasWithState`` running totals per user — the
    template for bespoke online aggregates (counters, decayed scores,
    fraud heuristics) that built-in windows can't express."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


FUNNEL_SCHEMA = "user_id BIGINT, stage INT, t1_us BIGINT, t3_us BIGINT"
_FUNNEL_STATE_SCHEMA = "t1 BIGINT, t2 BIGINT, t3 BIGINT"
_FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user funnel state machine: earliest 'view', earliest 'click'
    at-or-after it, earliest 'purchase' at-or-after that. State is
    three timestamps — O(1) per user."""
    if state.hasTimedOut:
        state.remove()
        return
    t1, t2, t3 = state.get if state.exists else (None, None, None)
    # ONE sort over the whole group: the iterator yields Arrow chunks
    # in shuffle order, so sorting each chunk independently would let
    # a later chunk's earlier event arrive after a dependent step.
    # Ties process earlier funnel steps first — the batch SQL's `>=`
    # comparisons count a click at exactly t1, so the view must
    # register before a same-timestamp click is examined.
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.assign(
            _rank=pdf["event_type"].map(
                {s: i for i, s in enumerate(_FUNNEL_STEPS)}
            ).fillna(len(_FUNNEL_STEPS))
        ).sort_values(["ts", "_rank"], kind="mergesort")
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            us = int(ts.value) // 1_000  # pandas Timestamp nanos → micros
            if etype == _FUNNEL_STEPS[0]:
                if t1 is None or us < t1:
                    t1 = us
            elif etype == _FUNNEL_STEPS[1]:
                if t1 is not None and us >= t1 and (t2 is None or us < t2):
                    t2 = us
            elif etype == _FUNNEL_STEPS[2]:
                if t2 is not None and us >= t2 and (t3 is None or us < t3):
                    t3 = us
    if t1 is None:
        # no funnel entry yet: write NO state — an all-null entry is
        # indistinguishable from absent state but would pin every
        # never-viewing user in the state store forever
        return
    state.update((t1, t2, t3))
    stage = 3 if t3 is not None else (2 if t2 is not None else 1)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [stage],
            "t1_us": [t1],
            "t3_us": [t3 if t3 is not None else None],
        }
    )


def funnel_stages(events: DataFrame) -> DataFrame:
    """Streaming funnel progression per user — the online twin of the
    batch ``events_funnel`` catalog entry, as a custom stateful
    operator (``applyInPandasWithState``, update mode): each batch
    emits the user's current deepest stage and conversion endpoints.

    Replay contract: per-user events must replay in event-time order
    ACROSS batches, and same-timestamp funnel steps must not straddle
    a batch boundary in reverse step order (a click@T closing batch N
    with its tied view@T opening batch N+1 would under-stage — within
    one batch the operator orders ties itself). That is the standard
    contract for ordered-state machines fed from a replayed log
    (time-ordered files / a time-partitioned topic); a fully
    out-of-order-proof exact funnel needs unbounded per-user state, so
    the bounded state machine documents the ordering assumption
    instead. Stream/batch equivalence under the contract is pinned by
    ``tests/test_streaming.py``."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=FUNNEL_SCHEMA,
            stateStructType=_FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


RATE_ANOMALY_SCHEMA = (
    "event_type STRING, hr BIGINT, cnt BIGINT, win_hours INT, "
    "expected DOUBLE, is_anomaly BOOLEAN"
)
_RATE_STATE_SCHEMA = "counts STRING"  # JSON {hr: cnt}, <= 26 entries
_RATE_TRAIL = 24  # trailing window hours (current hour excluded)
_RATE_MIN_HOURS = 8


def _rate_anomaly_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-type hourly spike detector: state is the trailing hour →
    count map (bounded at 26 entries), the 3-sigma test is the same
    cross-multiplied integer predicate the batch entry uses — Python
    ints are exact at any magnitude, so the decision is engine-exact.
    """
    import json

    if state.hasTimedOut:
        state.remove()
        return
    counts: dict[int, int] = (
        {int(k): int(v) for k, v in json.loads(state.get[0]).items()}
        if state.exists
        else {}
    )
    touched: set[int] = set()
    for pdf in pdfs:
        if not len(pdf):
            continue
        hrs = (pdf["ts"].astype("int64") // 1_000) // 3_600_000_000
        for h, c in hrs.value_counts().items():
            h = int(h)
            counts[h] = counts.get(h, 0) + int(c)
            touched.add(h)
    if not counts:
        return
    # judge BEFORE pruning: a batch can span many hours for a sparse
    # type, and the early touched hours still deserve their (complete,
    # in-state) trailing windows; only the PERSISTED state is pruned
    # to the trailing horizon
    rows = []
    for h in sorted(touched):
        trail = [c for hh, c in counts.items() if h - _RATE_TRAIL <= hh <= h - 1]
        n, cnt = len(trail), counts[h]
        s, ss = sum(trail), sum(c * c for c in trail)
        dev = n * cnt - s
        is_anom = (
            n >= _RATE_MIN_HOURS and dev > 0 and dev * dev > 9 * (n * ss - s * s)
        )
        rows.append(
            (key[0], h, cnt, n, (float(s) / n) if n else None, is_anom)
        )
    keep_from = max(counts) - (_RATE_TRAIL + 1)
    counts = {h: c for h, c in counts.items() if h >= keep_from}
    state.update((json.dumps({str(h): c for h, c in counts.items()}),))
    if rows:
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type", "hr", "cnt", "win_hours", "expected", "is_anomaly",
            ],
        )


def rate_anomalies(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ``events_rate_anomaly`` entry:
    per-type hourly rate spike detection (3-sigma over the trailing
    24 nonempty hours, current hour excluded) as a custom stateful
    operator (``applyInPandasWithState``, update mode). Each batch
    re-emits the decision row for every hour it touched; ``cnt`` is
    strictly increasing per (type, hr) emission, so the final
    decision is the max-cnt row — no sink-order assumption.

    Replay contract (same as :func:`funnel_stages`): events replay in
    approximately event-time order — an hour's trailing window must
    be complete when the hour's last event arrives, which holds for
    time-ordered file replay / a time-partitioned topic. State is one
    bounded hour→count map per event type (<= 26 entries), pruned to
    the trailing horizon AFTER judging the batch's touched hours —
    O(1) per type regardless of stream length. A straggler arriving
    from far behind the pruned horizon would be judged against a
    truncated window — the contract violation the replay ordering
    rules out.

    Stream/batch equivalence under the contract is pinned by
    ``tests/test_streaming.py``."""
    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            _rate_anomaly_fn,
            outputStructType=RATE_ANOMALY_SCHEMA,
            stateStructType=_RATE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HEAVY_USERS_SCHEMA = (
    "event_type STRING, user_id BIGINT, mg_count BIGINT, n_processed BIGINT"
)
_HEAVY_STATE_SCHEMA = "counters STRING, n BIGINT"  # JSON {user: cnt}, <= k
_HEAVY_K = 20


def _mg_compress(counters: dict[int, int], k: int) -> dict[int, int]:
    """Merged Misra-Gries compression: if more than k counters
    survive a merge, subtract the (k+1)-th largest count from all and
    drop the non-positive — the classic bound (each surviving count
    undercounts its true frequency by at most N/(k+1)) is preserved
    under this batch merge (Agarwal et al., mergeable summaries)."""
    if len(counters) <= k:
        return counters
    thr = sorted(counters.values(), reverse=True)[k]
    return {u: c - thr for u, c in counters.items() if c - thr > 0}


def heavy_users(events: DataFrame, k: int = _HEAVY_K) -> DataFrame:
    """Streaming heavy-hitters (Misra-Gries, ``k`` counters) per
    event type: the bounded-state streaming twin of the batch
    ``text_heavy_hitters`` two-pass sketch. State is AT MOST k
    counters plus the processed-event total per type, regardless of
    how many distinct users the stream carries — the bounded-memory
    property that makes the sketch viable where a full per-user count
    table is not. Each batch re-emits the current candidate set
    (update mode); the FINAL decision per type is the emission with
    the max ``n_processed`` — counters can shrink between batches
    (compression), so earlier emissions are superseded, not
    accumulated.

    Guarantee (asserted by the replay test, batch-boundary
    independent): after any replay, every user with true per-type
    frequency > N/(k+1) is in the final candidate set, and
    ``true - N/(k+1) <= mg_count <= true`` (undercount only, never
    overcount)."""

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import json

        if state.hasTimedOut:
            state.remove()
            return
        counters: dict[int, int] = (
            {int(u): int(c) for u, c in json.loads(state.get[0]).items()}
            if state.exists
            else {}
        )
        n = int(state.get[1]) if state.exists else 0
        got_data = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            got_data = True
            n += len(pdf)
            for u, c in pdf["user_id"].astype("int64").value_counts().items():
                counters[int(u)] = counters.get(int(u), 0) + int(c)
            counters = _mg_compress(counters, k)
        if not got_data:
            return
        state.update((json.dumps({str(u): c for u, c in counters.items()}), n))
        yield pd.DataFrame(
            {
                "event_type": [key[0]] * len(counters),
                "user_id": list(counters.keys()),
                "mg_count": list(counters.values()),
                "n_processed": [n] * len(counters),
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=HEAVY_USERS_SCHEMA,
        stateStructType=_HEAVY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SILENCE_SCHEMA = "event_type STRING, last_seen_us BIGINT, silent_for_us BIGINT"
_SILENCE_STATE_SCHEMA = "last_us BIGINT"


def silent_sources(
    events: DataFrame, gap_minutes: int = 120, watermark: str = "30 minutes"
) -> DataFrame:
    """Silent-source alerting — the EVENT-TIME-TIMEOUT stateful
    pattern (the one ``applyInPandasWithState`` capability the other
    operators don't use): per event type, keep the last-seen event
    time and arm a timeout at last_seen + ``gap_minutes``; if the
    WATERMARK passes it with no new event, the timeout branch fires →
    ``(event_type, last_seen_us, silent_for_us)``, and the type
    re-registers when (if) it resumes.

    Judging silence by watermark instead of wall clock ties alerting
    to STREAM progress, not processing speed. Note the honest limit:
    alerts also depend on micro-batch boundaries — a gap that is
    bridged WITHIN one micro-batch (silent source resumes before the
    batch ends, watermark never observed between) raises no alert, so
    a coarse single-batch replay of a finished stream may alert less
    than the live run did. That is inherent to watermark-driven
    timeouts (the timeout can only fire between batches); the
    per-batch contract is deterministic, unlike wall-clock
    ProcessingTimeTimeout. State is one timestamp per type. The batch
    twin of the SIGNAL is ``events_resample``'s zero rows.
    """
    gap_ms = int(gap_minutes) * 60 * 1000
    gap_us = gap_ms * 1000

    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (last_us,) = state.get
            now_us = state.getCurrentWatermarkMs() * 1000
            state.remove()  # re-registers on the next event of this type
            yield pd.DataFrame(
                {
                    "event_type": [key[0]],
                    "last_seen_us": [last_us],
                    "silent_for_us": [max(now_us - last_us, gap_us)],
                }
            )
            return
        last_us = state.get[0] if state.exists else 0
        for pdf in pdfs:
            if len(pdf):
                last_us = max(
                    last_us, int(pdf["ts"].astype("int64").max()) // 1_000
                )
        state.update((last_us,))
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            fn,
            outputStructType=SILENCE_SCHEMA,
            stateStructType=_SILENCE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded stream to completion into an in-memory table;
    returns the started-and-stopped query. For tests/smoke."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
