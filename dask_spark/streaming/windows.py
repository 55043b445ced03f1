"""Structured Streaming operators (Spark-first; the reference has no
streaming — dask handles incoming data with distributed futures. This
module is the streaming face of the engine per SURVEY §2.11).

Each op has a batch twin so the driver's DuckDB oracle can check the
semantics on the static `events` table; the streaming wrapper applies
the identical transformation under readStream with a watermark."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame as SparkDF, Window


def _tumbling(sdf: SparkDF, duration: str) -> SparkDF:
    return (
        sdf.groupBy(
            F.window("ts", duration).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def tumbling_window_agg(frame, duration: str = "10 minutes"):
    """Batch twin of the streaming tumbling-window count/sum."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions import normalize_ntz

    return DaskFrame(_tumbling(normalize_ntz(frame._sdf), duration))


def tumbling_window_stream(stream_sdf: SparkDF, duration: str = "10 minutes",
                           watermark: str = "30 minutes") -> SparkDF:
    """Streaming variant: same plan + watermark for state eviction.
    At scale, state is bounded by (watermark horizon × key cardinality)."""
    return _tumbling(stream_sdf.withWatermark("ts", watermark), duration)


def sessionize_batch(frame, gap_seconds: int = 1800):
    """Gap-based sessions per user: session breaks when the gap to the
    previous event exceeds ``gap_seconds``. One shuffle on user_id.
    Streaming twin: ``F.session_window`` (see sessionize_stream)."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions import epoch_us, normalize_ntz

    sdf = normalize_ntz(frame._sdf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
    marked = sdf.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn(
        "session_id", F.sum("new_sess").over(wsum).cast("bigint")
    )
    out = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return DaskFrame(out)


def session_stats(frame, gap_seconds: int = 1800,
                  conversion_type: str = "purchase"):
    """Session-level behavior table → DaskFrame(user_id, session_id,
    n_events, duration_s, n_types, converted): the per-session rollup
    (engagement length, breadth, conversion flag) product analytics
    reads off sessionized logs — one user-keyed window pass for the
    gap-break assignment (the sessionize_batch machinery) + ONE
    (user, session)-keyed aggregate.

    duration_s is exact integer seconds (max−min of epoch
    microseconds, one division by 1e6 both engines truncate
    identically via floor on nonnegative values); n_types is an exact
    distinct count inside the same aggregate."""
    from dask_spark.frame import DaskFrame
    from dask_spark.functions import epoch_us, normalize_ntz

    sdf = normalize_ntz(frame._sdf if isinstance(frame, DaskFrame)
                        else frame)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
    marked = sdf.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1)
        .otherwise(0),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.withColumn(
        "session_id", F.sum("new_sess").over(wsum).cast("bigint")
    )
    out = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.floor(
            (F.max(epoch_us("ts")) - F.min(epoch_us("ts")))
            / F.lit(1_000_000)
        ).cast("bigint").alias("duration_s"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.max(
            (F.col("event_type") == F.lit(conversion_type)).cast("int")
        ).cast("boolean").alias("converted"),
    )
    return DaskFrame(out)


def sessionize_stream(stream_sdf: SparkDF, gap: str = "30 minutes",
                      watermark: str = "1 hour") -> SparkDF:
    """Streaming sessionization via native session_window state."""
    return (
        stream_sdf.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def stateful_running_max(stream_sdf: SparkDF, timeout_ms: int = 60000) -> SparkDF:
    """Custom stateful operator scaffold: running per-user max(value)
    via applyInPandasWithState (arbitrary state, Arrow-batched) —
    the Spark twin of a custom dask stateful future pipeline."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, max_value double"
    state_schema = "max_value double"

    def update(key, pdf_iter, state: GroupState):
        mx = state.get[0] if state.exists else float("-inf")
        for pdf in pdf_iter:
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((mx,))
        import pandas as pd

        yield pd.DataFrame({"user_id": [key[0]], "max_value": [mx]})

    return stream_sdf.groupBy("user_id").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_user_stats(stream_sdf: SparkDF, ttl_minutes: int | None = None,
                        value_col: str = "value") -> SparkDF:
    """Per-key running (count, sum, max) via ``transformWithStateInPandas``
    — Spark 4's arbitrary-state API (typed value state, optional TTL,
    RocksDB-backed in production). The modern successor of the
    applyInPandasWithState scaffold above: state is schema'd and
    evictable per entry instead of one opaque tuple per key.

    100 TB shape: state lives in the state store keyed by the groupBy
    key (RocksDB + changelog checkpointing on a real cluster — set
    ``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
    provider and state spills to local SSD instead of executor heap);
    TTL bounds state for unbounded key spaces.

    Requires ``protobuf`` (the state-server wire protocol of the new
    API) — raises a clear ImportError where it is absent, like
    read_avro without the spark-avro package."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(google.protobuf); pip install protobuf — falling back to "
            "stateful_running_max (applyInPandasWithState) works without it"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total", DoubleType()),
            StructField("mx", DoubleType()),
        ]
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            ttl = ttl_minutes * 60_000 if ttl_minutes else None
            self._st = handle.getValueState("agg", state_schema, ttl)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total, mx = (
                self._st.get() if self._st.exists() else (0, 0.0, float("-inf"))
            )
            for pdf in rows:
                if len(pdf):
                    n += len(pdf)
                    total += float(pdf[value_col].sum())
                    mx = max(mx, float(pdf[value_col].max()))
            self._st.update((n, total, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n": [n], "total": [total], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return stream_sdf.groupBy("user_id").transformWithStateInPandas(
        UserStats(),
        outputStructType="user_id bigint, n bigint, total double, max_value double",
        outputMode="Update",
        timeMode="None",
    )


def stream_stream_join(left: SparkDF, right: SparkDF, on: str,
                       left_ts: str = "ts", right_ts: str = "ts",
                       watermark: str = "30 minutes",
                       interval: str = "15 minutes") -> SparkDF:
    """Watermarked stream-stream inner join: each side keeps state only
    inside its watermark horizon, and the time-bound predicate lets
    Spark evict rows (bounded state at any scale — the dask analog
    would be joining two live futures streams, which dask cannot
    bound)."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {interval}")
        )
    )
    return lw.join(rw, cond, "inner")


def dedup_stream(stream_sdf: SparkDF, keys: list[str],
                 ts_col: str = "ts", watermark: str = "30 minutes") -> SparkDF:
    """Streaming exact dedup with bounded state:
    dropDuplicatesWithinWatermark keeps one row per key inside the
    watermark horizon then evicts — the streaming twin of
    operators/dedup.exact_dedup for continuous corpus ingestion."""
    return stream_sdf.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def foreach_batch_sink(stream_sdf: SparkDF, fn, checkpoint: str,
                       trigger_seconds: int | None = None):
    """writeStream.foreachBatch wrapper: ``fn(batch_df, batch_id)`` runs
    per micro-batch with exactly-once semantics given an idempotent fn
    (batch_id is stable across replays). Returns the started query."""
    w = stream_sdf.writeStream.foreachBatch(fn).option(
        "checkpointLocation", checkpoint
    )
    if trigger_seconds:
        w = w.trigger(processingTime=f"{trigger_seconds} seconds")
    return w.start()


def funnel_stream(stream_sdf: SparkDF, steps, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id") -> SparkDF:
    """Streaming ordered funnel: per-user funnel depth maintained as
    ARBITRARY STATE across micro-batches via applyInPandasWithState —
    the streaming twin of operators/behavior.py funnel_users. State
    per user is two scalars (current step, last matched timestamp in
    ns), so total state is users × 16 bytes regardless of stream
    length.

    Semantics: strict > chaining on (ts, id)-ordered events — a
    greedy in-order scan reproduces the batch earliest-qualifying
    chain exactly, so for in-timestamp-order arrival (the exactness
    test's finite file stream) the final per-user depth equals
    funnel_users on the same rows. Late (out-of-order) events can
    only under-advance, never corrupt state — the documented
    at-most trade of a greedy streaming funnel."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    step_list = [str(s) for s in steps]
    if len(step_list) < 1:
        raise ValueError("funnel needs at least one step")
    out_schema = f"{user_col} bigint, max_step int"
    state_schema = "step int, tprev_ns bigint"

    def update(key, pdf_iter, state: GroupState):
        step, tprev = (state.get if state.exists else (0, -1))
        rows = [p for p in pdf_iter if len(p)]
        if rows:
            pdf = pd.concat(rows).sort_values([ts_col, id_col])
            ts_ns = pdf[ts_col].astype("int64").to_numpy()
            types = pdf[type_col].to_numpy()
            for t, et in zip(ts_ns, types):
                if step >= len(step_list):
                    break
                if et == step_list[step] and (step == 0 or t > tprev):
                    tprev = int(t)
                    step += 1
            state.update((step, tprev))
        yield pd.DataFrame({user_col: [key[0]], "max_step": [step]})

    return stream_sdf.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )


def attribution_stream(stream_sdf: SparkDF,
                       conversion_type: str = "purchase",
                       user_col: str = "user_id",
                       type_col: str = "event_type",
                       ts_col: str = "ts", id_col: str = "event_id",
                       within_seconds: int | None = None) -> SparkDF:
    """Streaming last-touch attribution: per-user the LAST
    non-conversion touch rides as arbitrary state (type + ns
    timestamp — two scalars per user at any stream length) and every
    conversion event emits one attribution row; the streaming twin of
    operators/behavior.py last_touch_attribution.

    Semantics: a greedy in-(ts, id)-order scan per micro-batch. For
    in-order arrival the emitted credits equal the batch window
    exactly (pinned in tests); a late-arriving touch can only MISS
    credit for conversions already emitted — the documented at-most
    trade every streaming attributor makes. Aggregate the emitted
    rows downstream for the per-type conversion counts."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{user_col} bigint, attributed_type string, n int"
    state_schema = "touch_type string, touch_ns bigint"
    win_ns = (None if within_seconds is None
              else int(within_seconds) * 1_000_000_000)

    def update(key, pdf_iter, state: GroupState):
        touch_type, touch_ns = (
            state.get if state.exists else (None, -1)
        )
        credits: dict = {}
        rows = [p for p in pdf_iter if len(p)]
        if rows:
            pdf = pd.concat(rows).sort_values([ts_col, id_col])
            ts_ns = pdf[ts_col].astype("int64").to_numpy()
            types = pdf[type_col].to_numpy()
            for t, et in zip(ts_ns, types):
                if et == conversion_type:
                    ok = touch_type is not None and (
                        win_ns is None or int(t) - touch_ns <= win_ns
                    )
                    k = touch_type if ok else "(none)"
                    credits[k] = credits.get(k, 0) + 1
                else:
                    touch_type, touch_ns = str(et), int(t)
            state.update((touch_type, touch_ns))
        out = pd.DataFrame({
            user_col: [key[0]] * len(credits),
            "attributed_type": list(credits),
            "n": list(credits.values()),
        })
        yield out

    return stream_sdf.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )


def ewma_stream(stream_sdf: SparkDF, value_col: str = "value",
                group_col: str = "event_type", ts_col: str = "ts",
                alpha: float = 0.3) -> SparkDF:
    """Streaming EWMA of the daily mean per group — the monitor
    family's trend line maintained as ARBITRARY STATE
    (applyInPandasWithState): per group the state is FOUR scalars
    (open day, its micro-unit sum + count, current y), so state never
    scales with stream length or day count.

    Semantics: days close when a later day arrives IN ORDER (the
    funnel_stream contract) — each micro-batch folds its complete
    days with EXACTLY the batch ewma_smooth arithmetic (micro-unit
    int64 day sums, y = alpha*x + (1-alpha)*y left-to-right), so for
    in-order arrival the emitted (day, x, ewma) rows equal the batch
    operator bit-for-bit (pinned in tests); the still-open day stays
    in state until its successor shows up. Late events for a CLOSED
    day are dropped — the at-most trade every streaming smoother
    makes."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {a}")
    out_schema = f"{group_col} string, day string, x double, ewma double"
    state_schema = "open_day string, s6 long, n long, y double, has_y int"

    def update(key, pdf_iter, state: GroupState):
        open_day, s6, n, y, has_y = (
            state.get if state.exists else (None, 0, 0, 0.0, 0)
        )
        out_days, out_x, out_e = [], [], []

        def close_day():
            nonlocal y, has_y
            x = float(s6) / float(n) / 1_000_000.0
            y = x if not has_y else a * x + (1.0 - a) * y
            has_y = 1
            out_days.append(open_day)
            out_x.append(round(x, 6))
            out_e.append(round(y, 6))

        rows = [p for p in pdf_iter if len(p)]
        if rows:
            pdf = pd.concat(rows).dropna(subset=[ts_col, value_col])
            pdf = pdf.sort_values(ts_col)
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                day = str(pd.Timestamp(ts).date())
                if open_day is None:
                    open_day, s6, n = day, 0, 0
                elif day > open_day:
                    close_day()
                    open_day, s6, n = day, 0, 0
                elif day < open_day:
                    continue  # late event for a closed day: dropped
                s6 += int((round(float(v), 6) * 1_000_000) + 0.5)
                n += 1
            state.update((open_day, s6, n, y, has_y))
        yield pd.DataFrame({
            group_col: [key[0]] * len(out_days),
            "day": out_days, "x": out_x, "ewma": out_e,
        })

    return stream_sdf.groupBy(group_col).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout,
    )
