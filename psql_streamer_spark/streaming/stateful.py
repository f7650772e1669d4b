"""Stateful streaming operators: watermarked dedup, windowed aggregation,
sessionization (built-in and custom state).

The reference is at-least-once (README.md:58): a batch the sink took but
whose offset commit raced a crash is redelivered, and the per-event UUID
(source/postgres/postgres.go:349) exists precisely so downstream can
reconcile replays (F5). These operators ARE that downstream: bounded-state
dedup by UUID, plus the event-time window/session analytics the reference
lacks but a Spark-native engine gets from the same primitives.

Scale notes: all state here is keyed and watermark-bounded — state size is
O(live keys within the watermark horizon), not O(stream length), so the
operators hold at 100 TB/day ingest as long as the watermark delay is
finite. State lives in the per-partition state store (RocksDB on a real
cluster: spark.sql.streaming.stateStore.providerClass), sharded by the
grouping key — no driver-side state anywhere.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# -- F5: replay reconciliation ----------------------------------------------


def dedup_events_within_watermark(
    df: DataFrame,
    ts_col: str = "ts",
    delay: str = "10 minutes",
    keys: tuple[str, ...] = ("uuid",),
) -> DataFrame:
    """Drop redelivered events by UUID with bounded state: a duplicate
    arriving within `delay` of the original is suppressed; state for an
    event is evicted once the watermark passes it. This turns the
    pipeline's at-least-once delivery into effectively-once for any
    consumer placed after it (F5; the reference leaves this entirely to
    downstream, README.md:58)."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(list(keys))


# -- event-time windowed aggregation with late-data cutoff ------------------


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "10 minutes",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time counts. In append mode a window emits only when
    the watermark passes its end — i.e. results are final, and events
    later than `delay` are dropped rather than retracting published rows
    (the B1 batch semantics upgraded to event time)."""
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(group_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "n_events",
        )
    )


def session_window_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Built-in session windows: per-key sessions close after `gap` of
    inactivity; watermark bounds how long an open session's state is
    retained. This is the declarative fast path — use the custom operator
    below only when per-session logic can't be expressed as an agg."""
    return (
        df.withWatermark(ts_col, delay)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


# -- custom stateful operator: applyInPandasWithState sessionizer -----------

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("emit_reason", StringType()),  # "gap" | "timeout"
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),  # session first-event epoch µs
        StructField("last_us", LongType()),  # session last-event epoch µs
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def sessionize_with_state(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    gap_minutes: int = 30,
    delay: str = "10 minutes",
) -> DataFrame:
    """Custom sessionizer over `applyInPandasWithState` — the engine's
    template for operators whose per-group logic the built-ins can't
    express (here: per-session aggregates + an explicit emit reason).

    Semantics: events for a key extend its open session while the gap to
    the previous event is < `gap_minutes`; a larger gap closes the old
    session (emitted with reason "gap") and opens a new one. An open
    session whose quiet period outlives the watermark is closed by
    event-time timeout (reason "timeout") — so every session is emitted
    exactly once, with state bounded by the watermark horizon.
    """
    import pandas as pd  # executor-side import

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdf_iter: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        out: list[tuple] = []

        def emit(st: tuple, reason: str) -> None:
            start_us, last_us, n, total = st
            out.append(
                (
                    user_id,
                    pd.Timestamp(start_us, unit="us"),
                    pd.Timestamp(last_us, unit="us"),
                    n,
                    total,
                    reason,
                )
            )

        if state.hasTimedOut:
            if state.exists:
                emit(tuple(state.get), "timeout")
                state.remove()
            yield pd.DataFrame(out, columns=SESSION_OUTPUT.names)
            return

        cur = tuple(state.get) if state.exists else None
        # applyInPandasWithState splits big groups into multiple Arrow
        # chunks with NO cross-chunk time ordering — sorting each chunk
        # independently would corrupt session assignment (spurious gap
        # closes) once a key's batch exceeds maxRecordsPerBatch. Gather
        # the whole group's batch, sort ONCE, then scan.
        chunks = list(pdf_iter)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(ts_col)
            # normalize to ns first: Arrow may hand datetime64[us] or [ns]
            ts_us = (
                pdf[ts_col].astype("datetime64[ns]").astype("int64") // 1000
            ).tolist()
            vals = pdf[value_col].astype("float64").tolist()
            for t, v in zip(ts_us, vals):
                if cur is None:
                    cur = (t, t, 1, v)
                elif t - cur[1] < gap_us:
                    cur = (cur[0], max(cur[1], t), cur[2] + 1, cur[3] + v)
                else:  # inactivity gap exceeded -> close and reopen
                    emit(cur, "gap")
                    cur = (t, t, 1, v)
        if cur is not None:
            state.update(cur)
            # close via event-time timeout once the watermark passes the
            # session's quiet period
            state.setTimeoutTimestamp(cur[1] // 1000 + gap_minutes * 60 * 1000)
        yield pd.DataFrame(out, columns=SESSION_OUTPUT.names)

    return (
        df.withWatermark(ts_col, delay)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


# --------------------------------------------------------------------------
# transformWithState (Spark 4): running per-key totals across micro-batches.
# --------------------------------------------------------------------------
RUNNING_TOTALS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def running_totals_with_state(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained across micro-batches with
    the Spark 4 ``transformWithStateInPandas`` API — the modern successor
    to applyInPandasWithState (typed per-state handles, explicit time
    modes, evolvable state). This is the continuously-materialized counter
    shape (the streaming face of a CDC-maintained aggregate): each batch
    emits the UPDATED totals for exactly the keys it touched.

    The classic-API sessionizer above stays the template for
    timeout-driven emission; this operator pins the new API so both
    stateful surfaces are exercised.

    ENVIRONMENT GATE: executing the stream (not building it) requires
    ``google.protobuf`` — transformWithState's Python<->JVM state protocol
    is protobuf-framed — which this container lacks; the e2e test
    skip-marks itself when the import fails, exactly like the Kafka jar
    gate. Plan construction and the processor contract are exercised
    regardless.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "totals",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("total", DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # executor-side

            prev = self._state.get() if self._state.exists() else (0, 0.0)
            n, total = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_OUTPUT,
        outputMode="Update",
        timeMode="None",
    )
