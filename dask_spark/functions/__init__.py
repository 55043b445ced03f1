"""Shared scalar helpers used across operators and queries.

``normalize_ntz`` / ``epoch_us`` exist because parquet written by
different writers may carry either ``TIMESTAMP`` (with local-tz
semantics) or ``TIMESTAMP_NTZ`` (no timezone) for the same logical
event-time column, and several event-time operators (windows, as-of
joins, sessionization) need a single canonical type. The engine pins
the session timezone to UTC, so casting NTZ -> TIMESTAMP preserves the
wall-clock value exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import TimestampNTZType


def normalize_ntz(sdf):
    """Cast every top-level TIMESTAMP_NTZ column to session-tz
    TIMESTAMP (the session tz is pinned UTC, so wall-clock values are
    preserved bit-for-bit). Ingest-level canonicalization: downstream
    event-time operators (``F.window``, ``unix_micros``, interval
    arithmetic) all require the LTZ TIMESTAMP type."""
    for f in sdf.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            sdf = sdf.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return sdf


def epoch_us(col: str | Column) -> Column:
    """Microseconds since epoch for a TIMESTAMP *or* TIMESTAMP_NTZ
    column (``F.unix_micros`` alone rejects NTZ input). The extra
    cast is a no-op for LTZ timestamps, so this is safe to use
    unconditionally on any event-time column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def md5_prefix60(col: str | Column) -> Column:
    """First 15 md5 hex chars as a non-negative 60-bit bigint — THE
    engine-portable pseudo-random hash used wherever an output must be
    replayable by a plain-SQL oracle (MinHash/SimHash md5 modes, the
    timeseries generator, temperature_mix selection). DuckDB twin:
    ``('0x' || substr(md5(x), 1, 15))::BIGINT``. The 15-char/60-bit
    width is load-bearing for every one of those oracles — change it
    here or nowhere."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
