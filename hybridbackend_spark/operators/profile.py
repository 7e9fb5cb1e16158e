"""Single-pass data profiling: per-column row/null/distinct counts and
value ranges in long format — the schema-validation companion to the
reference's cross-file consistency CLI (``data/validate.py:40-75``
checks names/dtypes/shapes across files; this checks the VALUES).

One job over the table computes every column's statistics together
(Catalyst plans a single scan with all aggregates fused), then the
single result row is unpivoted driver-free into (column, stat...) rows.
At 100 TB this is exactly as expensive as one full-table aggregate —
the count-distincts expand to one extra shuffle each under
``spark.sql.execution.removeRedundantAggregates``; swap to
``approx_count_distinct`` via ``exact_distinct=False`` when cardinality
precision is not worth that cost.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["profile_columns", "mad_outliers", "skew_report"]

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
    mean_dp: int = 4,
    repartition_to: int | None = None,
) -> DataFrame:
    """Profile ``cols`` (default: all non-complex columns) into one row
    per column: ``column_name, n_rows, n_null, n_distinct, min_value,
    max_value, mean_value``. Min/max are rendered as strings so mixed
    column types share one schema; mean is NULL for non-numerics and
    rounded to ``mean_dp`` for engine-stable hashing.

    ``repartition_to`` raises parallelism when the input has few splits
    (a small file on a big machine): the profiled columns are projected
    FIRST, so the exchange moves only those columns. With healthy scan
    parallelism (any real cluster at scale) leave it None — the fused
    aggregate is then one pass over the (column-pruned) scan with
    map-side partials.
    """
    dtypes = dict(df.dtypes)
    if cols is None:
        cols = [
            c
            for c, t in df.dtypes
            if not (t.startswith("array") or t.startswith("struct") or t.startswith("map"))
        ]
    distinct_fn = (
        F.count_distinct if exact_distinct else F.approx_count_distinct
    )
    df = df.select(*cols)
    if repartition_to:
        df = df.repartition(repartition_to)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        base = dtypes[c].split("(")[0]
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(distinct_fn(F.col(c)).alias(f"_dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
        if base in _NUMERIC:
            aggs.append(
                F.round(F.avg(F.col(c)), mean_dp).cast("double").alias(f"_mean_{c}")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_mean_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
            F.col(f"_mean_{c}").alias("mean_value"),
        )
        for c in cols
    ]
    return row.select(
        F.explode(F.array(*per_col)).alias("_p")
    ).select("_p.*")


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
    stat_dp: int = 4,
) -> DataFrame:
    """Robust per-group outlier flagging via median absolute deviation:
    a row is an outlier when ``|x - median| > k * MAD``. Unlike
    mean/std screens, one extreme value cannot drag the threshold (the
    breakdown point is 50%) — the right screen for monitoring corpus
    quality metrics or metric streams with heavy tails.

    Plan shape: two grouped ordered-statistic aggregations on the SAME
    group key (median, then median of absolute deviations) with a join
    back after each — the group-stats side is group-cardinality-sized,
    so Catalyst/AQE broadcasts it; the fact side is never re-shuffled
    beyond the group key. Exact interpolated percentiles; at extreme
    group sizes swap to approx_percentile and keep the same shape.

    Returns the input plus (median, mad, is_outlier); stats rounded to
    ``stat_dp``.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    with_med = df.join(med, group_col)
    mad = with_med.groupBy(group_col).agg(
        F.expr(f"percentile(abs({value_col} - _med), 0.5)").alias("_mad")
    )
    out = with_med.join(mad, group_col)
    return (
        out.withColumn(
            "is_outlier",
            F.abs(F.col(value_col) - F.col("_med")) > F.lit(k) * F.col("_mad"),
        )
        .withColumn("median", F.round("_med", stat_dp))
        .withColumn("mad", F.round("_mad", stat_dp))
        .drop("_med", "_mad")
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    dp: int = 4,
) -> DataFrame:
    """Join/agg skew diagnostic for a key column: the top-``top_k`` keys
    with their counts, share, cumulative share, and skew ratio
    (count / mean-count-per-key). Returns
    (rank, key STRING, cnt, share_pct, cum_share_pct, skew_ratio).

    This is the decision input for salting and AQE skew thresholds at
    100 TB: a skew_ratio in the thousands on a join key means one
    reducer gets that multiple of the average partition. One partial+
    final count agg over the data; ranking/cumulation run on the
    top-k rows only (the limit happens BEFORE the window, so no global
    single-partition pass over all keys). ``top_k`` is the single-
    partition bound, so it is validated instead of trusted.
    """
    if not 0 < top_k <= 100_000:
        raise ValueError(
            f"skew_report: top_k={top_k} outside (0, 100000] — the ranked "
            "readout is single-partition by design and top_k is its bound"
        )
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("_n"), F.count(F.lit(1)).alias("_k")
    )
    top = counts.orderBy(F.desc("cnt"), "key").limit(top_k)
    w = Window.orderBy(F.desc("cnt"), "key")
    ranked = top.select(
        F.row_number().over(w).alias("rank"),
        "key",
        "cnt",
        F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "_cum"
        ),
    )
    nd = F.col("_n").cast("double")
    return (
        ranked.crossJoin(F.broadcast(totals))
        .select(
            "rank",
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") * 100.0 / nd, dp).alias(
                "share_pct"
            ),
            F.round(F.col("_cum").cast("double") * 100.0 / nd, dp).alias(
                "cum_share_pct"
            ),
            F.round(
                F.col("cnt").cast("double") / (nd / F.col("_k").cast("double")),
                dp,
            ).alias("skew_ratio"),
        )
    )
