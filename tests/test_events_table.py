"""events_table dtype-dispatch contract (plans/registry.py).

The driver's events.parquet physical type has varied across fixture
generations — TIMESTAMP(NANOS) in rounds 1-3 (read as LongType under
nanosAsLong), micros-NTZ from round 4 — and the current testdata only
exercises the NTZ branch, so these tests generate each physical type with
pyarrow to keep every branch covered (ADVICE r4), including the fail-loudly
TypeError for anything unexpected.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from customer_activity_lakehouse_spark.plans.registry import events_table


def _write_events(tmp_path, ts_values, ts_type):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(ts_values, ts_type),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(table, tmp_path / "events.parquet")
    return str(tmp_path)


MICROS = [1_700_000_000_123_456, 1_700_000_000_000_000]


def test_nanos_long_branch_div_truncates(spark, tmp_path):
    """TIMESTAMP(NANOS) files arrive as LongType (nanosAsLong=true); the
    rebuild must use integer DIV 1000 — sub-microsecond residue truncates,
    and large epoch-nanos must not round-trip through a double."""
    nanos = [MICROS[0] * 1000 + 789, MICROS[1] * 1000 + 1]
    sf = _write_events(tmp_path, nanos, pa.timestamp("ns"))
    df = events_table(spark, sf)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = [r.us for r in df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).collect()]
    assert got == MICROS


def test_micros_ntz_branch(spark, tmp_path):
    sf = _write_events(tmp_path, MICROS, pa.timestamp("us"))
    raw_type = spark.read.parquet(f"{sf}/events.parquet").schema["ts"].dataType
    assert isinstance(raw_type, T.TimestampNTZType)  # precondition: NTZ on disk
    df = events_table(spark, sf)
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    got = [r.us for r in df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).collect()]
    assert got == MICROS  # session tz is UTC, wall clock preserved exactly


def test_unexpected_ts_dtype_fails_loudly(spark, tmp_path):
    sf = _write_events(tmp_path, ["2023-11-14 22:13:20", "2023-11-14 22:13:21"], pa.string())
    with pytest.raises(TypeError, match="unsupported physical type"):
        events_table(spark, sf)
