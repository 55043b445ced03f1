"""TIMESTAMP_NTZ parity: parquet written without timezone metadata is
read by Spark 4 as TIMESTAMP_NTZ, which several event-time expressions
(``unix_micros``, NTZ->BIGINT casts, interval comparisons) reject at
analysis time. These tests pin the round-4 regression: the engine must
(a) canonicalize NTZ to LTZ TIMESTAMP at ingest and (b) keep the
event-time operator family working when handed a raw NTZ frame.

Unlike the rest of the suite (which synthesizes LTZ-timestamped
fixtures), this module also runs the events family over the driver's
own parquet when present, so pytest sees driver-data dtype drift
before the driver does."""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DRIVER_EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def ntz_events_path(tmp_path_factory):
    """events-shaped parquet whose ts column is timestamp[us] with NO
    timezone — exactly what newer driver data drops look like."""
    base = datetime.datetime(2024, 1, 1)
    n = 200
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "ts": [base + datetime.timedelta(minutes=7 * i) for i in range(n)],
            "user_id": [i % 5 for i in range(n)],
            "event_type": ["click" if i % 3 else "view" for i in range(n)],
            "value": [float(i % 97) for i in range(n)],
        }
    )
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl.column("ts").cast(pa.timestamp("us")),  # tz-naive micros
    )
    path = tmp_path_factory.mktemp("ntz") / "events_ntz.parquet"
    pq.write_table(tbl, str(path))
    return str(path)


def test_raw_read_is_ntz_and_engine_normalizes(spark, ntz_events_path):
    import dask_spark as ds

    raw = spark.read.parquet(ntz_events_path)
    assert dict(raw.dtypes)["ts"] == "timestamp_ntz", (
        "environment changed: naive parquet no longer reads as NTZ — "
        "revisit dask_spark.functions.normalize_ntz"
    )
    frame = ds.read_parquet(ntz_events_path)
    assert frame.dtypes["ts"] == "timestamp"


def test_normalize_preserves_wall_clock(spark, ntz_events_path):
    import dask_spark as ds

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(ntz_events_path).orderBy("event_id").limit(3)
    norm = ds.read_parquet(ntz_events_path).to_spark().orderBy("event_id").limit(3)
    raw_ts = [r["ts"] for r in raw.collect()]
    norm_ts = [r["ts"] for r in norm.collect()]
    assert [t.replace(tzinfo=None) for t in norm_ts] == [
        t.replace(tzinfo=None) for t in raw_ts
    ]


def _events_family(frame):
    """Run every event-time operator that broke in round 4 and return
    row counts (analysis errors would raise before any count)."""
    from dask_spark.streaming.windows import sessionize_batch, tumbling_window_agg

    counts = {}
    counts["sessionize"] = sessionize_batch(frame, gap_seconds=1800).compute().shape[0]
    counts["tumbling"] = tumbling_window_agg(frame, "10 minutes").compute().shape[0]
    left = frame[frame.event_id % 2 == 0][["event_id", "user_id", "ts"]]
    right = frame[frame.event_id % 2 == 1][["user_id", "ts", "value"]].rename(
        {"value": "prior_value"}
    )
    asof = left.merge_asof(right, on="ts", by="user_id", direction="backward",
                           tolerance=3600)
    counts["merge_asof"] = asof.compute().shape[0]
    return counts


def test_events_family_over_raw_ntz_frame(spark, ntz_events_path):
    """Operators must survive a frame that BYPASSED ingest normalization
    (someone hands the engine a raw NTZ DataFrame)."""
    from dask_spark.frame import DaskFrame

    frame = DaskFrame(spark.read.parquet(ntz_events_path))
    counts = _events_family(frame)
    assert counts["merge_asof"] == 100
    assert counts["sessionize"] > 0 and counts["tumbling"] > 0


def test_events_family_over_driver_data(spark):
    """The real gate: whatever dtype the driver's events.parquet has
    TODAY, the events family must run on it via queries.load()."""
    if not os.path.exists(DRIVER_EVENTS):
        pytest.skip("driver testdata absent")
    from dask_spark.queries import load

    frame = load(spark, os.path.dirname(DRIVER_EVENTS), "events")
    assert frame.dtypes["ts"] == "timestamp"
    counts = _events_family(frame)
    assert all(v > 0 for v in counts.values())
