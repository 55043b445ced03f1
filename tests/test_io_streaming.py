"""IO round-trips (reference: dask/dataframe/io/*) and Structured
Streaming smoke tests (rate/memory sinks)."""

from __future__ import annotations

import time

import pandas as pd
import pytest

from tests.conftest import assert_eq


@pytest.fixture()
def small_pdf():
    return pd.DataFrame(
        {"k": [1, 2, 3], "v": [1.5, 2.5, 3.5], "s": ["a", "b", "c"]}
    )


def test_parquet_roundtrip(spark, tmp_path, small_pdf):
    import dask_spark as ds

    f = ds.from_pandas(small_pdf)
    path = str(tmp_path / "t.parquet")
    f.to_parquet(path)
    assert_eq(ds.read_parquet(path), small_pdf)


def test_parquet_partitioned_write(spark, tmp_path, small_pdf):
    import dask_spark as ds

    f = ds.from_pandas(small_pdf)
    path = str(tmp_path / "part.parquet")
    f.to_parquet(path, partition_on=["s"])
    import os

    assert any(d.startswith("s=") for d in os.listdir(path))
    back = ds.read_parquet(path).compute()
    assert len(back) == 3


def test_csv_roundtrip(spark, tmp_path, small_pdf):
    import dask_spark as ds

    f = ds.from_pandas(small_pdf)
    path = str(tmp_path / "t.csv")
    f.to_csv(path)
    back = ds.read_csv(path, schema="k bigint, v double, s string")
    assert_eq(back, small_pdf)


def test_json_roundtrip(spark, tmp_path, small_pdf):
    import dask_spark as ds

    f = ds.from_pandas(small_pdf)
    path = str(tmp_path / "t.json")
    f.to_json(path)
    back = ds.read_json(path)[["k", "v", "s"]]
    assert_eq(back, small_pdf)


def test_orc_roundtrip(spark, tmp_path, small_pdf):
    import dask_spark as ds

    f = ds.from_pandas(small_pdf)
    path = str(tmp_path / "t.orc")
    f.to_orc(path)
    assert_eq(ds.read_orc(path), small_pdf)


def test_read_parquet_columns_pushdown(sf_dir):
    import dask_spark as ds
    from dask_spark.plans import read_schema_columns

    f = ds.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    assert read_schema_columns(f) == ["l_orderkey"]


def test_timeseries_generator(spark):
    import dask_spark as ds

    f = ds.timeseries(start="2026-01-01", end="2026-01-01 01:00", freq_seconds=60)
    out = f.compute()
    assert len(out) == 60
    assert {"ts", "uid", "name", "x", "y"} <= set(out.columns)


def test_read_sql_table_option_mapping():
    """No DB in the container — check the jdbc reader plumbing only."""
    from dask_spark.sources import read_sql_table

    with pytest.raises(Exception):
        # fails at connect time, but only AFTER options validate
        read_sql_table(
            "t", "jdbc:postgresql://nohost/db", partition_column="id",
            num_partitions=4, lower_bound=0, upper_bound=100,
        ).compute()


def test_streaming_tumbling_window(spark):
    from dask_spark.streaming.windows import tumbling_window_stream

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .withColumnRenamed("timestamp", "ts")
        .withColumn("event_type", (F.col("value") % 3).cast("string"))
        .withColumn("value", F.col("value").cast("double"))
    )
    out = tumbling_window_stream(rate, "10 seconds", "10 seconds")
    q = (
        out.writeStream.format("memory").queryName("t_win")
        .outputMode("update").start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("select * from t_win").count() > 0:
                break
            time.sleep(1)
        rows = spark.sql("select * from t_win").collect()
        assert len(rows) > 0
        assert {"window_start", "event_type", "n", "total_value"} <= set(
            rows[0].asDict()
        )
    finally:
        q.stop()


def test_streaming_stateful_running_max(spark):
    from dask_spark.streaming.windows import stateful_running_max

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .withColumn("user_id", F.col("value") % 5)
        .withColumn("value", F.col("value").cast("double"))
    )
    out = stateful_running_max(rate)
    # One retry: under heavy parallel-session load the first microbatch's
    # HDFS-backed state commit can abort (CANNOT_WRITE_STATE_STORE) — an
    # environment artifact of many temp state stores on one local disk,
    # not a semantics failure. A fresh query gets a fresh checkpoint.
    pdf = None
    for attempt in range(2):
        name = f"t_state_{attempt}"
        q = (
            out.writeStream.format("memory").queryName(name)
            .outputMode("update").start()
        )
        try:
            deadline = time.time() + 45
            while time.time() < deadline and q.isActive:
                if spark.sql(f"select * from {name}").count() > 0:
                    break
                time.sleep(1)
            pdf = spark.sql(f"select * from {name}").toPandas()
        finally:
            q.stop()
        if len(pdf) > 0:
            break
    assert pdf is not None and len(pdf) > 0
    # running max per user is monotone ≥ user_id (values start at 0)
    assert (pdf.max_value >= 0).all()


import pyspark.sql.functions as F  # noqa: E402  (used in streaming tests)


def _rate(spark, rps=200):
    return (
        spark.readStream.format("rate").option("rowsPerSecond", rps).load()
        .withColumnRenamed("timestamp", "ts")
    )


def test_stream_stream_join(spark):
    from dask_spark.streaming.windows import stream_stream_join

    # A stream-stream join keeps FOUR state stores per shuffle
    # partition; at the session default of 32 partitions that is 128
    # local-FS store setups+commits per micro-batch, and under host
    # load epoch 1 can still be committing past the poll deadline
    # (observed: 0 rows at t+45s, epoch 1 aborted by the stop-time
    # checkpoint cleanup at t+64s). State partitions are a scale knob,
    # so size them to the toy stream in a child session instead of
    # mutating the shared one.
    s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    left = _rate(s).withColumn("k", F.col("value") % 10)
    right = _rate(s).withColumn("k", F.col("value") % 10)
    out = stream_stream_join(
        left, right, on="k", watermark="10 seconds", interval="5 seconds"
    )
    q = (
        out.writeStream.format("memory").queryName("t_ssj")
        .outputMode("append").start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if s.sql("select * from t_ssj").count() > 0:
                break
            time.sleep(1)
        assert s.sql("select * from t_ssj").count() > 0
    finally:
        q.stop()


def test_dedup_stream(spark):
    from dask_spark.streaming.windows import dedup_stream

    src = _rate(spark).withColumn("k", F.col("value") % 5)
    out = dedup_stream(src, ["k"], ts_col="ts", watermark="1 minute")
    q = (
        out.writeStream.format("memory").queryName("t_dds")
        .outputMode("append").start()
    )
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            n = spark.sql("select * from t_dds").count()
            if n >= 5:
                break
            time.sleep(1)
        pdf = spark.sql("select * from t_dds").toPandas()
        # within the watermark horizon each key appears exactly once
        assert len(pdf) == pdf.k.nunique()
    finally:
        q.stop()


def test_foreach_batch_sink(spark, tmp_path):
    from dask_spark.streaming.windows import foreach_batch_sink

    seen: dict[int, int] = {}

    def sink(batch_df, batch_id):
        seen[batch_id] = batch_df.count()

    src = _rate(spark)
    q = foreach_batch_sink(src, sink, checkpoint=str(tmp_path / "ckpt"))
    try:
        deadline = time.time() + 30
        while time.time() < deadline and sum(seen.values()) == 0:
            time.sleep(1)
        assert sum(seen.values()) > 0
    finally:
        q.stop()


def test_read_fwf(spark, tmp_path):
    """Fixed-width read: substring slicing + trim + cast, with header
    rows skipped per file."""
    import dask_spark as ds

    lines = [
        "name      qty price",
        "apple       3  1.50",
        "banana     12  0.25",
    ]
    p = tmp_path / "fwf.txt"
    p.write_text("\n".join(lines) + "\n")
    got = (
        ds.read_fwf(
            str(p),
            colspecs=[(0, 10), (10, 13), (13, 19)],
            names=["name", "qty", "price"],
            dtypes=["string", "int", "double"],
            skiprows=1,
        )
        .compute()
        .sort_values("name", ignore_index=True)
    )
    assert list(got.name) == ["apple", "banana"]
    assert list(got.qty) == [3, 12]
    assert list(got.price) == [1.5, 0.25]


def test_streaming_batch_parity_tumbling(spark, tmp_path):
    """EXACTNESS: the streaming tumbling window over a finite file
    stream (availableNow trigger, complete mode) must produce exactly
    the batch twin's rows on the same data — not just a nonempty
    schema-shaped answer."""
    import pandas as pd

    import dask_spark as ds
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
    src = tmp_path / "events_stream"
    ds.from_pandas(pdf).to_parquet(str(src))

    batch = (
        tumbling_window_agg(ds.read_parquet(str(src)), "10 minutes")
        .compute()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )

    stream_sdf = spark.readStream.schema(
        "ts timestamp, event_type string, value double"
    ).parquet(str(src))
    out = tumbling_window_stream(stream_sdf, "10 minutes", "30 minutes")
    q = (
        out.writeStream.format("memory").queryName("t_parity")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = (
        spark.sql("select * from t_parity")
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    assert len(got) == len(batch) and len(got) > 0
    assert list(got.n) == list(batch.n)
    assert list(got.total_value) == list(batch.total_value)
    assert list(got.window_start) == list(batch.window_start)


def test_streaming_batch_parity_sessions(spark, tmp_path):
    """EXACTNESS for sessionization: native session_window over a
    finite file stream must carve the SAME sessions (per-user event
    counts) as the batch gap-window twin at the same 30-minute gap."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.streaming.windows import sessionize_batch, sessionize_stream

    # bursts with >30min gaps between them, interleaved across users
    offs, bursts = [], [0]
    for i in range(1, 120):
        bursts.append(bursts[-1] + (3600 if i % 7 == 0 else 60))
    ts = pd.to_datetime("2026-02-01") + pd.to_timedelta(bursts, unit="s")
    pdf = pd.DataFrame(
        {
            "event_id": range(120),
            "ts": ts,
            "user_id": [i % 3 for i in range(120)],
            "value": [float(i) for i in range(120)],
        }
    )
    src = tmp_path / "sess_stream"
    ds.from_pandas(pdf).to_parquet(str(src))

    batch = sessionize_batch(ds.read_parquet(str(src)), gap_seconds=1800).compute()
    batch_counts = sorted(zip(batch.user_id, batch.n_events))

    stream_sdf = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, value double"
    ).parquet(str(src))
    out = sessionize_stream(stream_sdf, "30 minutes", "2 hours")
    q = (
        out.writeStream.format("memory").queryName("s_parity")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = spark.sql("select * from s_parity").toPandas()
    got_counts = sorted(zip(got.user_id, got.n_events))
    assert got_counts == batch_counts and len(got_counts) > 3


def test_streaming_transform_with_state(spark):
    """Spark 4 arbitrary-state API (transformWithStateInPandas): the
    per-user running stats must appear and stay consistent (n >= 1,
    max <= total for non-negative values)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState needs protobuf (absent in container)",
    )
    from dask_spark.streaming.windows import stateful_user_stats

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
        .withColumn("user_id", F.col("value") % 5)
        .withColumn("value", F.col("value").cast("double"))
    )
    out = stateful_user_stats(rate)
    q = (
        out.writeStream.format("memory").queryName("t_tws")
        .outputMode("update").start()
    )
    try:
        deadline = time.time() + 40
        while time.time() < deadline:
            if spark.sql("select * from t_tws").count() > 0:
                break
            time.sleep(1)
        pdf = spark.sql("select * from t_tws").toPandas()
        assert len(pdf) > 0
        assert (pdf.n >= 1).all()
        assert (pdf.max_value <= pdf.total + 1e-9).all()
    finally:
        q.stop()


def test_read_parquet_dnf_filters(spark, sf_dir):
    """dask's tuple-DNF filters kwarg: flat list = AND, list-of-lists
    = OR of ANDs — and the predicate reaches the parquet scan."""
    import dask_spark as ds

    p = f"{sf_dir}/lineitem.parquet"
    flat = ds.read_parquet(
        p, columns=["l_quantity", "l_discount"],
        filters=[("l_quantity", "<", 10.0), ("l_discount", ">=", 0.05)],
    )
    pdf = flat.compute()
    assert (pdf.l_quantity < 10).all() and (pdf.l_discount >= 0.05).all()
    plan = flat._sdf._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan

    dnf = ds.read_parquet(
        p, filters=[[("l_quantity", "==", 1.0)], [("l_quantity", "==", 2.0)]]
    ).compute()
    assert set(dnf.l_quantity.unique()) <= {1.0, 2.0}
    assert len(dnf) > 0

    inlist = ds.read_parquet(
        p, filters=[("l_linestatus", "in", ["F"])]
    ).compute()
    assert set(inlist.l_linestatus.unique()) == {"F"}


def test_streaming_classifier_inference(spark):
    """Map-only operators run unchanged on streams: the hashed linear
    classifier scores a rate-source text stream (online quality
    filtering for continuous corpus ingestion) — pure projection, no
    state, no watermark needed."""
    from dask_spark.functions.text import hashed_linear_scores

    rate = (
        spark.readStream.format("rate").option("rowsPerSecond", 50).load()
        .withColumn(
            "text",
            F.concat(F.lit("doc token"), (F.col("value") % 7).cast("string")),
        )
    )
    W = [[float((f * 3 + c) % 5 - 2) for f in range(16)] for c in range(2)]
    out = hashed_linear_scores(rate, W, [0.0, 0.1], labels=["keep", "drop"])
    q = (
        out.select("value", "score_keep", "score_drop", "label")
        .writeStream.format("memory").queryName("t_clf")
        .outputMode("append").start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.sql("select * from t_clf").count() > 0:
                break
            time.sleep(1)
        pdf = spark.sql("select * from t_clf").toPandas()
        assert len(pdf) > 0
        assert set(pdf.label.unique()) <= {"keep", "drop"}
        assert pdf.score_keep.notna().all()
    finally:
        q.stop()


def test_parquet_file_sink_exactly_once(spark, tmp_path):
    """FileStreamSink manifest = exactly-once: a RESTARTED query over
    the same checkpoint must not duplicate rows already committed,
    and reads through spark.read see only committed files."""
    import pyspark.sql.functions as F

    from dask_spark.streaming.sinks import to_parquet_stream

    src_dir, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ck"))
    spark.range(0, 100).withColumn("v", F.col("id") * 2).write.json(src_dir)
    stream = spark.readStream.schema("id long, v long").json(src_dir)
    q = to_parquet_stream(stream, out, ckpt)
    q.processAllAvailable(); q.stop()
    assert spark.read.parquet(out).count() == 100
    # restart over the same checkpoint: committed batches are skipped
    stream2 = spark.readStream.schema("id long, v long").json(src_dir)
    q2 = to_parquet_stream(stream2, out, ckpt)
    q2.processAllAvailable(); q2.stop()
    got = spark.read.parquet(out)
    assert got.count() == 100  # no duplicates
    assert got.select(F.sum("v")).first()[0] == sum(2 * i for i in range(100))


def test_idempotent_batch_writer_replay(spark, tmp_path):
    """The batch-id partition overwrite pattern: replaying the SAME
    batch id rewrites its partition instead of appending a copy."""
    import pyspark.sql.functions as F

    from dask_spark.streaming.sinks import idempotent_parquet_writer

    path = str(tmp_path / "idem")
    write = idempotent_parquet_writer(path)
    batch = spark.range(0, 50).withColumn("v", F.col("id") + 1)
    write(batch, 7)
    write(batch, 7)          # replay after a simulated crash
    write(batch.limit(10), 8)  # a different batch appends normally
    got = spark.read.parquet(path)
    assert got.filter(F.col("__batch_id") == 7).count() == 50
    assert got.count() == 60


def test_rocksdb_state_store_runs_stateful_query(spark, tmp_path):
    """rocksdb_state_conf: the RocksDB provider (changelog
    checkpointing on) must run a watermarked stateful aggregation and
    produce the same counts as the default provider."""
    import pyspark.sql.functions as F

    from dask_spark.streaming.sinks import rocksdb_state_conf

    conf = rocksdb_state_conf(max_memory_mb=256)
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        src_dir = str(tmp_path / "src")
        spark.range(0, 300).select(
            (F.col("id") % 3).alias("k"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id"))
            .alias("ts"),
        ).write.json(src_dir)
        stream = spark.readStream.schema("k long, ts timestamp").json(src_dir)
        agg = (
            stream.withWatermark("ts", "10 seconds")
            .groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.format("memory").queryName("rocksdb_counts")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = {r["k"]: r["n"] for r in spark.sql(
            "SELECT * FROM rocksdb_counts").collect()}
        assert rows == {0: 100, 1: 100, 2: 100}
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_streaming_batch_parity_decontamination(spark, tmp_path):
    """EXACTNESS: bloom decontamination is a stateless scan→project
    plan, so the streaming run over a finite file stream must produce
    EXACTLY the batch twin's rows — same flags, same (possibly
    false-positive) hit counts."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.dedup import contamination_bloom
    from dask_spark.streaming.hygiene import decontaminate_stream

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(200):
        if i % 7 == 0:
            rows.append((i, base))                      # leaked eval doc
        elif i % 7 == 1:
            rows.append((i, base.replace("iota", "x"))) # partial overlap
        else:
            rows.append((i, f"doc {i} " + " ".join(
                f"w{(i * 31 + j) % 997}" for j in range(12)
            )))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = tmp_path / "corpus_stream"
    ds.from_pandas(pdf).to_parquet(str(src))
    bench = ds.from_pandas(pd.DataFrame({"doc_id": [0], "text": [base]}))

    batch = (
        contamination_bloom(ds.read_parquet(str(src)), bench)
        # both sides at DEFAULTS: the stream wrapper mirrors the batch
        # twin's hash_kind, so false positives must align
        .compute()
        .sort_values("doc_id", ignore_index=True)
    )
    assert batch.contaminated.sum() > 0  # the leak is detectable

    stream_sdf = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(str(src))
    out = decontaminate_stream(stream_sdf, bench)
    q = (
        out.writeStream.format("memory").queryName("t_decontam")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = (
        spark.sql("select * from t_decontam")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(got) == len(batch)
    assert list(got.doc_id) == list(batch.doc_id)
    assert list(got.hit_grams) == list(batch.hit_grams)
    assert list(got.contaminated) == list(batch.contaminated)


def test_streaming_batch_parity_dsir(spark, tmp_path):
    """EXACTNESS: DSIR scoring is a stateless scan→project once the
    log-ratio table is fitted from static frames, so the streaming run
    over a finite file stream must produce EXACTLY the batch scores."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.mixing import dsir_scores
    from dask_spark.streaming.hygiene import dsir_score_stream

    target_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (i, target_text if i % 5 == 0
         else f"doc {i} " + " ".join(f"w{(i * 17 + j) % 499}"
                                     for j in range(10)))
        for i in range(150)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = tmp_path / "dsir_stream"
    ds.from_pandas(pdf).to_parquet(str(src))
    corpus = ds.read_parquet(str(src))
    target = ds.from_pandas(
        pd.DataFrame({"doc_id": [0, 1], "text": [target_text] * 2})
    )

    batch = (
        dsir_scores(corpus, target, n_buckets=256)
        .compute().sort_values("doc_id", ignore_index=True)
    )
    assert batch.dsir_logweight.abs().sum() > 0

    stream_sdf = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(str(src))
    out = dsir_score_stream(stream_sdf, target, corpus, n_buckets=256)
    q = (
        out.writeStream.format("memory").queryName("t_dsir")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = (
        spark.sql("select * from t_dsir").toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(got) == len(batch)
    assert list(got.doc_id) == list(batch.doc_id)
    assert list(got.dsir_logweight) == list(batch.dsir_logweight)


def test_cms_heavy_stream_matches_batch(spark, tmp_path):
    """Streaming heavy-token boilerplate scoring == the batch twin,
    value-for-value: the sketch builds once from the static corpus
    and the per-doc scan is stateless, so microbatching cannot change
    a single fraction."""
    import dask_spark as ds
    from dask_spark.operators.sketch import cms_counts, cms_doc_heavy_fraction
    from dask_spark.streaming.hygiene import cms_heavy_stream

    rows = [
        (i, ("common " * (1 + i % 3)
             + " ".join(f"rare{i}_{j}" for j in range(i % 4))).strip())
        for i in range(120)
    ] + [(990, ""), (991, "   ")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    src = tmp_path / "cms_stream"
    ds.from_pandas(pdf).to_parquet(str(src))
    corpus = ds.read_parquet(str(src))

    counts = cms_counts(corpus, "text", depth=3, width=64)
    batch = (
        cms_doc_heavy_fraction(corpus, counts, min_count=50,
                               depth=3, width=64)
        .compute().sort_values("doc_id", ignore_index=True)
    )
    assert batch.heavy_frac.notna().sum() > 0
    assert batch.heavy_frac.isna().sum() == 2  # token-less docs

    stream_sdf = spark.readStream.schema(
        "doc_id long, text string"
    ).parquet(str(src))
    out = cms_heavy_stream(stream_sdf, corpus, min_count=50,
                           depth=3, width=64)
    q = (
        out.writeStream.format("memory").queryName("t_cmsheavy")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = (
        spark.sql("select * from t_cmsheavy").toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(got) == len(batch)
    assert list(got.doc_id) == list(batch.doc_id)
    assert list(got.n_tokens) == list(batch.n_tokens)
    assert got.heavy_frac.fillna(-1).tolist() == \
        batch.heavy_frac.fillna(-1).tolist()


def test_hll_distinct_stream_matches_batch(spark, tmp_path):
    """Streaming HLL registers (bounded <= 2^p state) == the batch
    register table after the stream drains, and the driver estimator
    over the streamed registers equals batch hll_count_distinct
    bit-for-bit."""
    import dask_spark as ds
    from dask_spark.operators.sketch import (
        hll_count_distinct,
        hll_estimate_registers,
        hll_registers,
    )
    from dask_spark.streaming.hygiene import hll_distinct_stream

    pdf = pd.DataFrame({
        "doc_id": range(400),
        "user": [f"u{(i * 13) % 97}" for i in range(400)],
    })
    src = tmp_path / "hll_stream"
    ds.from_pandas(pdf).to_parquet(str(src))
    corpus = ds.read_parquet(str(src))

    batch_regs = {
        r["register"]: r["max_rho"]
        for r in hll_registers(corpus, "user", p=7).to_spark().collect()
    }
    batch_row = hll_count_distinct(corpus, "user", p=7).to_spark().first()

    stream_sdf = spark.readStream.schema(
        "doc_id long, user string"
    ).parquet(str(src))
    out = hll_distinct_stream(stream_sdf, "user", p=7)
    q = (
        out.writeStream.format("memory").queryName("t_hll")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = {
        r["register"]: r["max_rho"]
        for r in spark.sql("select * from t_hll").collect()
    }
    assert got == batch_regs
    est, full, nz = hll_estimate_registers(list(got.values()), p=7)
    assert est == batch_row["est_distinct"]
    assert full == batch_row["sum_scaled"]
    assert nz == batch_row["nonzero_registers"]
    assert len(got) <= 128


def test_streaming_batch_parity_funnel(spark, tmp_path):
    """EXACTNESS for the stateful streaming funnel: per-user depth
    after a finite in-order file stream equals funnel_users on the
    same rows (greedy in-order scan == earliest-qualifying chain),
    including a user who stalls and a user with a pre-step-1 click."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.behavior import funnel_users
    from dask_spark.streaming.windows import funnel_stream

    base = pd.Timestamp("2026-03-01")
    rows = []
    eid = 0

    def ev(u, et, minutes):
        nonlocal eid
        rows.append((eid, base + pd.Timedelta(minutes=minutes), u, et))
        eid += 1

    for u in range(6):
        ev(u, "click", 0)          # pre-view click: must not count
        ev(u, "view", 1)
        if u % 2 == 0:
            ev(u, "click", 2)
        if u % 3 == 0:
            ev(u, "purchase", 3)
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type"])
    src = tmp_path / "funnel_stream"
    ds.from_pandas(pdf).to_parquet(str(src))

    steps = ["view", "click", "purchase"]
    batch = {
        r["user"]: r["max_step"]
        for r in funnel_users(
            ds.read_parquet(str(src)), steps
        ).to_spark().collect()
    }

    stream_sdf = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string"
    ).parquet(str(src))
    out = funnel_stream(stream_sdf, steps)
    q = (
        out.writeStream.format("memory").queryName("f_parity")
        .outputMode("update").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got_pdf = spark.sql(
        "select user_id, max_step from f_parity"
    ).toPandas()
    # update mode may emit once per batch; the LAST row per user is
    # the final state (availableNow drains in order)
    got = {int(r.user_id): int(r.max_step)
           for r in got_pdf.itertuples()}
    assert got == batch and len(got) == 6
    # spot-check semantics: u0 completes, u1 stalls at view
    assert batch[0] == 3 and batch[1] == 1


def test_streaming_batch_parity_psi(spark, tmp_path):
    """EXACTNESS for the streaming PSI monitor: bucket counts
    aggregated over a finite file stream (state <= bins rows) +
    the finish() fold equal the batch psi_drift value bit-for-bit."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.monitor import psi_drift
    from dask_spark.streaming.hygiene import psi_bucket_stream

    ref_pdf = pd.DataFrame({"x": [float(v % 97) for v in range(500)]})
    cur_pdf = pd.DataFrame({"x": [float((v % 83) + 20) for v in range(400)]})
    ref_src = tmp_path / "psi_ref"
    cur_src = tmp_path / "psi_cur"
    ds.from_pandas(ref_pdf).to_parquet(str(ref_src))
    ds.from_pandas(cur_pdf).to_parquet(str(cur_src))

    ref = spark.read.parquet(str(ref_src))
    batch = psi_drift(
        ref, spark.read.parquet(str(cur_src)), "x", bins=16
    ).to_spark().first()["psi"]

    stream_sdf = spark.readStream.schema("x double").parquet(str(cur_src))
    counts, finish = psi_bucket_stream(stream_sdf, ref, "x", bins=16)
    q = (
        counts.writeStream.format("memory").queryName("psi_parity")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    rows = spark.sql("select * from psi_parity").collect()
    assert len(rows) <= 16  # bounded state
    assert finish(rows) == batch


def test_streaming_batch_parity_chi2(spark, tmp_path):
    """EXACTNESS for the streaming chi-square gate: category counts
    aggregated over a finite file stream (state <= |categories| rows)
    + the finish() fold equal the batch chi2_drift row bit-for-bit,
    including dof over the UNION category set (a stream-only category
    must widen dof)."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.monitor import chi2_drift
    from dask_spark.streaming.hygiene import chi2_category_stream

    ref_pdf = pd.DataFrame(
        {"k": (["click"] * 300 + ["view"] * 500 + ["buy"] * 50)}
    )
    cur_pdf = pd.DataFrame(
        {"k": (["click"] * 100 + ["view"] * 600 + ["refund"] * 30)}
    )
    ref_src = tmp_path / "chi_ref"
    cur_src = tmp_path / "chi_cur"
    ds.from_pandas(ref_pdf).to_parquet(str(ref_src))
    ds.from_pandas(cur_pdf).to_parquet(str(cur_src))

    ref = spark.read.parquet(str(ref_src))
    b = chi2_drift(
        ref, spark.read.parquet(str(cur_src)), "k"
    ).to_spark().first()

    stream_sdf = spark.readStream.schema("k string").parquet(str(cur_src))
    counts, finish = chi2_category_stream(stream_sdf, ref, "k")
    q = (
        counts.writeStream.format("memory").queryName("chi2_parity")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    rows = spark.sql("select * from chi2_parity").collect()
    assert len(rows) <= 4  # bounded state: stream categories only
    chi2, dof, n_ref, n_cur = finish(rows)
    assert (chi2, dof, n_ref, n_cur) == (
        b["chi2"], b["dof"], b["n_ref"], b["n_cur"]
    )
    assert dof == 3  # union of {click,view,buy} and {click,view,refund}


def test_hll_windowed_stream_matches_batch(spark, tmp_path):
    """Windowed streaming HLL: per-day register tables over a finite
    file stream equal the batch keyed hll_registers, and the
    per-window estimator equals batch hll_count_distinct(group_cols)
    bit-for-bit; state is bounded by windows * 2^p."""
    import datetime as dt

    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.sketch import (
        hll_count_distinct,
        hll_estimate_registers,
    )
    from dask_spark.streaming.hygiene import hll_distinct_windowed_stream

    rows = []
    for d in range(3):
        for u in range(120 + 40 * d):
            rows.append(
                (dt.datetime(2024, 5, 1 + d, 9, u % 60), f"u{u % (80 + d)}")
            )
    pdf = pd.DataFrame(rows, columns=["ts", "user"])
    src = tmp_path / "hll_win"
    ds.from_pandas(pdf).to_parquet(str(src))

    import pyspark.sql.functions as F

    batch = spark.read.parquet(str(src)).withColumn(
        "day", F.date_trunc("day", "ts")
    )
    batch_rows = {
        (r["day"], r["register"]): r["max_rho"]
        for r in __import__("dask_spark.operators.sketch",
                            fromlist=["hll_registers"])
        .hll_registers(batch, "user", p=7, group_cols=["day"])
        .to_spark().collect()
    }
    batch_est = {
        r["day"]: r["est_distinct"]
        for r in hll_count_distinct(
            batch, "user", p=7, group_cols=["day"]
        ).to_spark().collect()
    }

    stream_sdf = spark.readStream.schema("ts timestamp, user string") \
        .parquet(str(src))
    out = hll_distinct_windowed_stream(
        stream_sdf, "user", ts_col="ts", window="1 day", p=7
    )
    q = (
        out.writeStream.format("memory").queryName("hllwin_parity")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = spark.sql("select * from hllwin_parity").collect()
    assert len(got) <= 3 * 128  # bounded state
    got_regs = {(r["window_start"], r["register"]): r["max_rho"]
                for r in got}
    assert got_regs == batch_rows

    from collections import defaultdict

    per_win = defaultdict(list)
    for r in got:
        per_win[r["window_start"]].append(r["max_rho"])
    for day, rhos in per_win.items():
        est, _, _ = hll_estimate_registers(rhos, p=7)
        assert est == batch_est[day]


def test_streaming_batch_parity_attribution(spark, tmp_path):
    """Streaming last-touch attribution over a finite in-order file
    stream aggregates to EXACTLY the batch last_touch_attribution
    counts, including the within-window demotion to '(none)'."""
    import datetime as dt

    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.behavior import last_touch_attribution
    from dask_spark.streaming.windows import attribution_stream

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in range(6):
        for k, (sec, et) in enumerate([
            (0, "click"), (10, "view"), (20, "purchase"),
            (30, "purchase"), (9000, "purchase"),
        ]):
            eid += 1
            rows.append((eid, u, t0 + dt.timedelta(seconds=sec + u), et))
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                      "event_type"])
    src = tmp_path / "attr_stream"
    ds.from_pandas(pdf).to_parquet(str(src))

    batch = {
        r["attributed_type"]: r["conversions"]
        for r in last_touch_attribution(
            spark.read.parquet(str(src)), within_seconds=3600
        ).to_spark().collect()
    }

    stream_sdf = spark.readStream.schema(
        "event_id bigint, user_id bigint, ts timestamp, event_type string"
    ).parquet(str(src))
    out = attribution_stream(stream_sdf, within_seconds=3600)
    q = (
        out.writeStream.format("memory").queryName("attr_parity")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got_rows = spark.sql(
        "select attributed_type, sum(n) as c from attr_parity group by 1"
    ).collect()
    got = {r["attributed_type"]: int(r["c"]) for r in got_rows}
    assert got == batch
    # and the shape is right: views credit 2 per user, nones 1
    assert got["view"] == 12 and got["(none)"] == 6


def test_streaming_batch_parity_ewma(spark, tmp_path):
    """Streaming EWMA emits, for every CLOSED day, exactly the batch
    ewma_smooth row (bit-for-bit micro-unit means and fold); the
    still-open last day stays in state."""
    import datetime as dt

    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.monitor import ewma_smooth
    from dask_spark.streaming.windows import ewma_stream

    rows = []
    eid = 0
    for d in range(4):
        for i, v in enumerate([1.25, 2.5, 3.125][: d + 1]):
            eid += 1
            rows.append(
                ("a", dt.datetime(2024, 1, 1 + d, 9, i), v + d, eid)
            )
    pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value",
                                      "event_id"])
    src = tmp_path / "ewma_stream"
    ds.from_pandas(pdf).to_parquet(str(src))

    batch = {
        r["day"]: (r["x"], r["ewma"])
        for r in ewma_smooth(
            spark.read.parquet(str(src)), alpha=0.3
        ).to_spark().collect()
    }

    stream_sdf = spark.readStream.schema(
        "event_type string, ts timestamp, value double, event_id bigint"
    ).parquet(str(src))
    out = ewma_stream(stream_sdf, alpha=0.3)
    q = (
        out.writeStream.format("memory").queryName("ewma_parity")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = {r["day"]: (r["x"], r["ewma"])
           for r in spark.sql("select * from ewma_parity").collect()}
    # closed days = all but the last
    assert set(got) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    for day, pair in got.items():
        assert pair == batch[day]


def test_read_parquet_merge_schema(spark, tmp_path):
    """Schema evolution across files: merge_schema=True unifies the
    widened schema (old files null-pad the new column), matching
    dask's pyarrow-dataset unification."""
    import dask_spark as ds

    import pandas as pd

    p = tmp_path / "evolve"
    ds.from_pandas(pd.DataFrame({"id": [1, 2]})).to_parquet(
        str(p / "part0"))
    ds.from_pandas(pd.DataFrame({"id": [3], "extra": ["x"]})).to_parquet(
        str(p / "part1"))

    merged = ds.read_parquet(
        [str(p / "part0"), str(p / "part1")], merge_schema=True
    )
    pdf = merged.to_spark().orderBy("id").toPandas()
    assert list(pdf.columns) == ["id", "extra"] or \
        sorted(pdf.columns) == ["extra", "id"]
    assert pdf[pdf["id"] == 1]["extra"].isna().all()
    assert pdf[pdf["id"] == 3]["extra"].iloc[0] == "x"


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static dimension enrichment: each micro-batch equi-joins
    the static dim (broadcast — no state store involved) and the
    drained result equals the batch join exactly."""
    import pandas as pd

    import dask_spark as ds
    import pyspark.sql.functions as F

    src = tmp_path / "enrich_stream"
    ds.from_pandas(pd.DataFrame({
        "event_id": range(8),
        "event_type": ["click", "view", "purchase", "click",
                       "error", "view", "signup", "purchase"],
    })).to_parquet(str(src))
    dim = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"),
         ("purchase", "convert"), ("signup", "convert")],
        "event_type string, category string",
    )

    batch = {
        (r["event_id"], r["category"])
        for r in spark.read.parquet(str(src))
        .join(F.broadcast(dim), "event_type", "left")
        .select("event_id", "category").collect()
    }

    stream_sdf = spark.readStream.schema(
        "event_id bigint, event_type string"
    ).parquet(str(src))
    out = stream_sdf.join(F.broadcast(dim), "event_type", "left") \
        .select("event_id", "category")
    q = (
        out.writeStream.format("memory").queryName("enrich_parity")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = {(r["event_id"], r["category"])
           for r in spark.sql("select * from enrich_parity").collect()}
    assert got == batch
    assert (4, None) in got  # 'error' has no dim row -> null category


def test_streaming_batch_parity_ks_binned(spark, tmp_path):
    """EXACTNESS for the streaming binned-KS gate: bucket counts
    aggregated over a finite file stream (state <= bins rows, grid
    anchored on the STATIC reference) + the finish() integer fold
    equal the batch ks_drift(exact=False, anchor="reference") row
    bit-for-bit — including out-of-range stream values clamped into
    the tail buckets."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.monitor import ks_drift
    from dask_spark.streaming.hygiene import ks_binned_stream

    ref_pdf = pd.DataFrame({"x": [float(v % 97) for v in range(500)]})
    # shifted + out-of-range values (up to 102 > ref max 96)
    cur_pdf = pd.DataFrame({"x": [float((v % 83) + 20) for v in range(400)]})
    ref_src = tmp_path / "ksb_ref"
    cur_src = tmp_path / "ksb_cur"
    ds.from_pandas(ref_pdf).to_parquet(str(ref_src))
    ds.from_pandas(cur_pdf).to_parquet(str(cur_src))

    ref = spark.read.parquet(str(ref_src))
    batch = ks_drift(
        ref, spark.read.parquet(str(cur_src)), "x",
        exact=False, bins=32, anchor="reference",
    ).to_spark().first()

    stream_sdf = spark.readStream.schema("x double").parquet(str(cur_src))
    counts, finish = ks_binned_stream(stream_sdf, ref, "x", bins=32)
    q = (
        counts.writeStream.format("memory").queryName("ksb_parity")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    rows = spark.sql("select * from ksb_parity").collect()
    assert len(rows) <= 32  # bounded state
    d_stat, d_num, n_ref, n_cur = finish(rows)
    assert (d_stat, d_num, n_ref, n_cur) == (
        batch["d_stat"], batch["d_num"], batch["n_ref"], batch["n_cur"]
    )


def test_ks_binned_stream_constant_reference(spark, tmp_path):
    """Degenerate grid: a constant reference collapses every value
    into bucket 0 on BOTH the stream and batch sides (the documented
    batch mirror), so D reflects only count imbalance — 0 here."""
    import pandas as pd

    import dask_spark as ds
    from dask_spark.operators.monitor import ks_drift
    from dask_spark.streaming.hygiene import ks_binned_stream

    ref_pdf = pd.DataFrame({"x": [5.0] * 100})
    cur_pdf = pd.DataFrame({"x": [float(v) for v in range(50)]})
    ref_src = tmp_path / "ksc_ref"
    cur_src = tmp_path / "ksc_cur"
    ds.from_pandas(ref_pdf).to_parquet(str(ref_src))
    ds.from_pandas(cur_pdf).to_parquet(str(cur_src))

    ref = spark.read.parquet(str(ref_src))
    batch = ks_drift(
        ref, spark.read.parquet(str(cur_src)), "x",
        exact=False, bins=32, anchor="reference",
    ).to_spark().first()

    stream_sdf = spark.readStream.schema("x double").parquet(str(cur_src))
    counts, finish = ks_binned_stream(stream_sdf, ref, "x", bins=32)
    q = (
        counts.writeStream.format("memory").queryName("ksc_parity")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    rows = spark.sql("select * from ksc_parity").collect()
    got = finish(rows)
    assert got == (batch["d_stat"], batch["d_num"],
                   batch["n_ref"], batch["n_cur"])
    assert got[0] == 0.0
