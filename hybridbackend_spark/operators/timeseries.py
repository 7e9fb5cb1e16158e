"""Time-series regularization: bucket, resample, and gap-fill irregular
event streams into fixed-step series.

The reference's metric streams (``tensorflow/metrics``) assume regularly
spaced updates; real event data is irregular. ``resample_fill`` turns a
(key, ts, value) stream into one row per key per step with the gaps
filled — forward-fill (state carried) or linear interpolation (bounded
by the surrounding observations).

Scale shape: one partial-agg groupBy((key, bucket)) compresses the
stream to one row per occupied bucket; a per-key ordered window finds
each bucket's successor; `sequence()` + explode generates ONLY the
missing buckets between neighbors (never a dense calendar cross join —
the classic scale mistake is calendar x keys). Shuffle volume is
occupied buckets, and the explode fan-out equals the actual gap sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["resample_fill"]


def resample_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    how: str = "ffill",
    agg: str = "sum",
    value_dp: int = 6,
) -> DataFrame:
    """Resample to a regular grid of ``step_seconds`` per ``key_col``.

    1. Bucket each row to ``floor(epoch / step) * step`` and aggregate
       ``value_col`` per (key, bucket) with ``agg`` (sum/avg/min/max/
       count).
    2. For every pair of CONSECUTIVE occupied buckets, emit the missing
       grid points between them, valued by:
       - ``how="ffill"``: the left neighbor's value (state carry);
       - ``how="linear"``: linear interpolation between neighbors.

    The series spans each key's own [min, max] observed range (no
    extrapolation — trailing gaps after the last observation are
    unknowable). Values round to ``value_dp`` for engine-stable hashing.
    Returns (key, bucket_ts, value, filled) where ``filled`` marks
    generated rows.
    """
    if how not in ("ffill", "linear"):
        raise ValueError("how must be 'ffill' or 'linear'")
    aggs = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": lambda c: F.count(c),
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}")

    step = F.lit(int(step_seconds)).cast("long")
    bucket = (F.unix_timestamp(F.col(ts_col)).cast("long") / step).cast(
        "long"
    ) * step
    occupied = (
        df.select(
            F.col(key_col).alias("_k"),
            bucket.alias("_b"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy("_k", "_b")
        # round at the bucket boundary so interpolation runs on the same
        # quantized neighbors in every engine/partitioning
        .agg(
            F.round(aggs[agg](F.col("_v")).cast("double"), value_dp).alias("_v")
        )
    )
    w = Window.partitionBy("_k").orderBy("_b")
    with_next = occupied.select(
        "_k",
        "_b",
        "_v",
        F.lead("_b").over(w).alias("_nb"),
        F.lead("_v").over(w).alias("_nv"),
    )
    # real rows
    real = with_next.select(
        F.col("_k").alias(key_col),
        F.col("_b").alias("bucket_ts"),
        F.round("_v", value_dp).alias("value"),
        F.lit(False).alias("filled"),
    )
    # gap rows: grid points strictly between _b and _nb
    gaps = with_next.filter(
        F.col("_nb").isNotNull() & (F.col("_nb") > F.col("_b") + step)
    ).select(
        "_k",
        "_b",
        "_v",
        "_nb",
        "_nv",
        F.explode(
            F.sequence(F.col("_b") + step, F.col("_nb") - step, step)
        ).alias("_g"),
    )
    if how == "ffill":
        gap_value: Column = F.col("_v")
    else:
        frac = (F.col("_g") - F.col("_b")).cast("double") / (
            F.col("_nb") - F.col("_b")
        ).cast("double")
        gap_value = F.col("_v") + (F.col("_nv") - F.col("_v")) * frac
    filled = gaps.select(
        F.col("_k").alias(key_col),
        F.col("_g").alias("bucket_ts"),
        F.round(gap_value, value_dp).alias("value"),
        F.lit(True).alias("filled"),
    )
    return real.unionAll(filled)
