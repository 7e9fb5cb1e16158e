"""Wave-8: MERGE INTO, provenance scan, WOE/IV, seasonal decomposition,
target-size compaction writer."""

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from hybridbackend_spark.functions.feature import woe_iv
from hybridbackend_spark.operators.structural import merge_into
from hybridbackend_spark.operators.timeseries import seasonal_dow
from hybridbackend_spark.sources.tabular import (
    estimate_row_bytes,
    read_parquet_with_provenance,
    write_compacted,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_merge_into_update_insert_delete(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    source = spark.createDataFrame(
        [(2, "B", False), (3, None, True), (4, "d", False)],
        "k long, v string, _del boolean",
    )
    out = {r.k: r.v for r in merge_into(target, source, ["k"], "_del").collect()}
    assert out == {1: "a", 2: "B", 4: "d"}  # 3 deleted, 2 updated, 4 inserted


def test_merge_into_no_delete_col(spark):
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    source = spark.createDataFrame([(1, "A"), (2, "b")], "k long, v string")
    out = {r.k: r.v for r in merge_into(target, source, ["k"]).collect()}
    assert out == {1: "A", 2: "b"}


def test_merge_into_schema_mismatch_raises(spark):
    target = spark.createDataFrame([(1, "a")], "k long, v string")
    source = spark.createDataFrame([(1, "A", 9)], "k long, v string, extra long")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_into(target, source, ["k"])


def test_provenance_rows_stable(spark, sf_dir):
    df = read_parquet_with_provenance(spark, f"{sf_dir}/orders.parquet")
    assert "_source_file" in df.columns and "_source_row" in df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("_source_file", "_source_row").alias("d"),
        F.min("_source_row").alias("mn"),
    ).collect()[0]
    assert agg.n == agg.d  # (file, row) is a unique address
    assert agg.mn == 0
    files = {r._source_file for r in df.select("_source_file").distinct().collect()}
    assert files == {"orders.parquet"}


def test_woe_iv_hand_computed(spark):
    # cat A: 8 pos / 2 neg; cat B: 2 pos / 8 neg; totals 10/10
    rows = [("A", True)] * 8 + [("A", False)] * 2 + [
        ("B", True)
    ] * 2 + [("B", False)] * 8
    df = spark.createDataFrame(rows, "c string, y boolean")
    out = {r.category: r for r in woe_iv(df, "c", F.col("y")).collect()}
    # bits(8)+bits(10) - bits(2)-bits(10) = 3-1 = 2 ; B symmetric -2
    assert out["A"].woe_bits == 2 and out["B"].woe_bits == -2
    assert out["A"].iv_term == round((0.8 - 0.2) * 2, 6)
    assert out["B"].iv_term == round((0.2 - 0.8) * -2, 6)


def test_woe_iv_zero_class_null(spark):
    rows = [("A", True)] * 5 + [("B", False)] * 5 + [("B", True)] * 2
    df = spark.createDataFrame(rows, "c string, y boolean")
    out = {r.category: r for r in woe_iv(df, "c", F.col("y")).collect()}
    assert out["A"].woe_bits is None and out["A"].iv_term == 0.0
    assert out["B"].woe_bits is not None


def test_seasonal_dow_constant_series(spark):
    # constant daily value -> zero seasonal and residual everywhere
    rows = [(_ts(f"2024-01-{d:02d} 12:00:00"), 10.0) for d in range(1, 29)]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = seasonal_dow(df, "ts", "value").collect()
    assert len(out) == 28
    assert all(r.seasonal == 0.0 and r.residual == 0.0 for r in out)
    assert all(r.day_total == 10.0 and r.dow_mean == 10.0 for r in out)


def test_seasonal_dow_weekend_lift(spark):
    # weekdays 10, sundays 80 -> sunday seasonal positive, others negative
    rows = []
    for d in range(1, 29):
        ts = _ts(f"2024-01-{d:02d} 00:00:00")
        rows.append((ts, 80.0 if ts.weekday() == 6 else 10.0))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = seasonal_dow(df, "ts", "value").collect()
    sun = [r for r in out if r.dow == 0]
    rest = [r for r in out if r.dow != 0]
    assert all(r.seasonal == 70.0 * 4 / 28 * 7 / 7 or r.seasonal > 0 for r in sun)
    assert all(r.seasonal < 0 for r in rest)
    assert all(r.residual == 0.0 for r in out)  # perfectly weekly pattern


def test_write_compacted_target_file_count(spark, sf_dir, tmp_path):
    src = f"{sf_dir}/lineitem.parquet"
    rb = estimate_row_bytes(src)
    assert rb > 0
    df = spark.read.parquet(src)
    out = str(tmp_path / "compact")
    # pick a target that forces a handful of files
    n_rows = df.count()
    total_mb = n_rows * rb / (1024 * 1024)
    n_files = write_compacted(df, out, rb, target_mb=total_mb / 3)
    written = glob.glob(os.path.join(out, "*.parquet"))
    assert len(written) == n_files
    assert n_files >= 2  # actually split
    back = spark.read.parquet(out)
    assert back.count() == n_rows
