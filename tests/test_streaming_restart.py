"""Streaming restart/recovery EXACTNESS (r12 verdict item 5).

Every stream/batch parity pin so far was a single run. These tests
stop a checkpointed streaming query after half the data, add the rest,
restart the SAME query over the SAME checkpoint, and pin that the
recovered output still equals the batch twin over the FULL data — the
exactly-once claim the checkpoint + idempotent sink combination makes.
A third no-new-data restart pins replay safety (no duplication).

Mechanics shared by all three stateful families:
- source: a parquet directory; halves are separate files, so run 2's
  FileStreamSource sees exactly the new file. The halves INTERLEAVE
  (even/odd rows), so the same windows/buckets/registers receive
  contributions from both runs — the recovered state genuinely merges
  with new data rather than sitting disjoint beside it.
- sink: foreach_batch_sink + idempotent_parquet_writer (batch-id
  partition overwrite, exactly-once on replay) in complete mode; the
  max-__batch_id partition is the final snapshot.
"""

from __future__ import annotations

import pandas as pd
import pytest

import dask_spark as ds
from dask_spark.streaming.sinks import idempotent_parquet_writer
from dask_spark.streaming.windows import foreach_batch_sink


def _run_checkpointed(stream_out, ckpt: str, out: str):
    """One availableNow run of the query over checkpoint ``ckpt``,
    sinking complete-mode snapshots to ``out`` (batch-id partitioned)."""
    q = (
        stream_out.writeStream.foreachBatch(idempotent_parquet_writer(out))
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()


def _final_snapshot(spark, out: str):
    """Rows of the highest batch id = the last complete-mode emission."""
    sdf = spark.read.parquet(out)
    mx = sdf.agg({"__batch_id": "max"}).first()[0]
    return sdf.filter(sdf["__batch_id"] == mx).drop("__batch_id")


def _us(pdf):
    """pandas writes ns-unit timestamps (TIMESTAMP(NANOS), which the
    engine session reads as bigint) — coerce to µs so the declared
    readStream schema ``timestamp`` matches the files."""
    out = pdf.copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
    return out


def _write_halves(tmp_path, pdf):
    src = tmp_path / "src"
    src.mkdir()
    _us(pdf.iloc[0::2]).to_parquet(str(src / "half1.parquet"), index=False)
    return src


def _add_second_half(src, pdf):
    _us(pdf.iloc[1::2]).to_parquet(str(src / "half2.parquet"), index=False)


def test_restart_parity_windowed_agg(spark, tmp_path):
    """Tumbling-window agg killed after half the data and restarted
    from the checkpoint equals the batch twin over the full data."""
    from dask_spark.streaming.windows import (
        tumbling_window_agg,
        tumbling_window_stream,
    )

    ts = pd.to_datetime("2026-01-01") + pd.to_timedelta(
        [i * 97 for i in range(500)], unit="s"
    )
    pdf = pd.DataFrame(
        {
            "ts": ts,
            "event_type": [str(i % 3) for i in range(500)],
            "value": [float(i % 17) for i in range(500)],
        }
    )
    src = _write_halves(tmp_path, pdf)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def start_run():
        stream = spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).parquet(str(src))
        return tumbling_window_stream(stream, "10 minutes", "30 minutes")

    _run_checkpointed(start_run(), ckpt, out)  # run 1: half the data
    _add_second_half(src, pdf)
    _run_checkpointed(start_run(), ckpt, out)  # run 2: recovery + rest

    got = (
        _final_snapshot(spark, out)
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    full = tmp_path / "full"
    ds.from_pandas(pdf).to_parquet(str(full))
    batch = (
        tumbling_window_agg(ds.read_parquet(str(full)), "10 minutes")
        .compute()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    assert len(got) == len(batch) and len(got) > 0
    assert list(got.n) == list(batch.n)
    assert list(got.total_value) == list(batch.total_value)
    assert list(got.window_start) == list(batch.window_start)

    # run 3: no new data — replay must not duplicate or drift
    _run_checkpointed(start_run(), ckpt, out)
    again = (
        _final_snapshot(spark, out)
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    assert list(again.n) == list(batch.n)


def test_restart_parity_psi_gate(spark, tmp_path):
    """PSI drift gate: bucket counts recovered from the checkpoint +
    the second half equal the batch psi_drift over the full current
    set, bit-for-bit through the same finish() fold."""
    from dask_spark.operators.monitor import psi_drift
    from dask_spark.streaming.hygiene import psi_bucket_stream

    ref_pdf = pd.DataFrame({"x": [float(v % 97) for v in range(500)]})
    cur_pdf = pd.DataFrame({"x": [float((v % 83) + 20) for v in range(400)]})
    ref_src = tmp_path / "ref"
    ds.from_pandas(ref_pdf).to_parquet(str(ref_src))
    ref = spark.read.parquet(str(ref_src))

    src = _write_halves(tmp_path, cur_pdf)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    finish_holder = {}

    def start_run():
        stream = spark.readStream.schema("x double").parquet(str(src))
        counts, finish = psi_bucket_stream(stream, ref, "x", bins=16)
        finish_holder["finish"] = finish
        return counts

    _run_checkpointed(start_run(), ckpt, out)
    _add_second_half(src, cur_pdf)
    _run_checkpointed(start_run(), ckpt, out)

    rows = _final_snapshot(spark, out).collect()
    assert len(rows) <= 16  # state stayed bins-bounded across restart

    full = tmp_path / "full"
    ds.from_pandas(cur_pdf).to_parquet(str(full))
    batch = psi_drift(
        ref, spark.read.parquet(str(full)), "x", bins=16
    ).to_spark().first()["psi"]
    assert finish_holder["finish"](rows) == batch

    # replay safety
    _run_checkpointed(start_run(), ckpt, out)
    rows = _final_snapshot(spark, out).collect()
    assert finish_holder["finish"](rows) == batch


def test_restart_parity_hll(spark, tmp_path):
    """HLL register table recovered from the checkpoint + the second
    half equals the batch register table over the full data; the
    estimate matches hll_count_distinct exactly."""
    from dask_spark.operators.sketch import (
        hll_count_distinct,
        hll_estimate_registers,
    )
    from dask_spark.streaming.hygiene import hll_distinct_stream

    pdf = pd.DataFrame(
        {
            "doc_id": range(400),
            "user": [f"u{(i * 13) % 97}" for i in range(400)],
        }
    )
    src = _write_halves(tmp_path, pdf)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def start_run():
        stream = spark.readStream.schema(
            "doc_id long, user string"
        ).parquet(str(src))
        return hll_distinct_stream(stream, "user", p=7)

    _run_checkpointed(start_run(), ckpt, out)
    _add_second_half(src, pdf)
    _run_checkpointed(start_run(), ckpt, out)

    got = {
        r["register"]: r["max_rho"]
        for r in _final_snapshot(spark, out).collect()
    }
    assert len(got) <= 128  # bounded register state across restart

    full = tmp_path / "full"
    ds.from_pandas(pdf).to_parquet(str(full))
    corpus = ds.read_parquet(str(full))
    batch_row = hll_count_distinct(corpus, "user", p=7).to_spark().first()
    est, full_sum, nz = hll_estimate_registers(list(got.values()), p=7)
    assert est == batch_row["est_distinct"]
    assert full_sum == batch_row["sum_scaled"]
    assert nz == batch_row["nonzero_registers"]
