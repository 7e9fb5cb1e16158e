"""Data-layout operators: Z-order (Morton) multi-dimensional clustering
for scan pruning.

Why this exists at 100 TB: parquet/ORC skip row groups via min/max
statistics, and a table range-partitioned + sorted on ONE column prunes
only predicates on that column. Interleaving the bits of several columns
into one Morton key and laying the table out in key order keeps row-group
min/max ranges narrow on EVERY participating column at once, so
`WHERE a = ... AND b BETWEEN ...` skips most of the file regardless of
which dimension the predicate hits. This is the standard lakehouse
OPTIMIZE ZORDER BY recipe, built from pure integer expressions + one
range repartition — no UDFs, no driver data beyond a 1-row bounds agg.

Reference anchor: the reference reads row-group-partitioned parquet and
relies on filter pushdown into the scan (hybridbackend/tensorflow/data
parquet readers); Z-order is the layout-side complement that makes those
pushed filters actually skip IO on more than one key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["zorder_key", "cluster_by_zorder", "column_bounds", "sort_key_advisor"]


def column_bounds(df: DataFrame, cols: Sequence[str]) -> list[tuple[float, float]]:
    """(min, max) per column in ONE fused aggregation job (a single
    driver row — runs eagerly)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    row = df.agg(*aggs).first()
    return [(row[2 * i], row[2 * i + 1]) for i in range(len(cols))]


def zorder_key(
    cols: Sequence[Column | str],
    bounds: Sequence[tuple[float, float]],
    bits: int = 8,
) -> Column:
    """Morton (Z-order) key: each column normalizes to a ``bits``-bit
    fixed-point rank inside its [min, max] bounds, then ranks interleave
    bit-by-bit (column i contributes bit b to position ``b*n + i``).
    Pure integer arithmetic — portable to any engine (the oracle
    replicates it), codegen-friendly, zero shuffle.

    ``bits * len(cols)`` must be <= 63. Nulls rank lowest (0).
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits({bits}) * ncols({n}) must fit a signed long")
    if len(bounds) != n:
        raise ValueError("one (min, max) bound per column required")
    top = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        lo, hi = (float(bounds[i][0]), float(bounds[i][1]))
        if hi > lo:
            scaled = F.floor(
                (col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * top
            ).cast("long")
            scaled = F.least(F.greatest(scaled, F.lit(0)), F.lit(top))
        else:
            scaled = F.lit(0).cast("long")
        scaled = F.coalesce(scaled, F.lit(0))
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(scaled, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return key


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    bounds: Sequence[tuple[float, float]] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Lay a table out in Z-order: range-repartition on the Morton key
    (balanced output files via range sampling) and sort within each
    partition, so every written row group covers a compact Z-curve
    segment — narrow min/max on ALL ``cols``. Chain directly into
    ``.write.parquet(...)``.

    If ``bounds`` is omitted they are computed with one eager 1-row
    aggregation job (:func:`column_bounds`).
    """
    if bounds is None:
        bounds = column_bounds(df, cols)
    keyed = df.withColumn("_zkey", zorder_key(cols, bounds, bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "_zkey")
        if num_partitions
        else keyed.repartitionByRange("_zkey")
    )
    return parted.sortWithinPartitions("_zkey").drop("_zkey")


def sort_key_advisor(
    df: DataFrame,
    candidates: Sequence[str],
    measure_cols: Sequence[str],
    dp: int = 6,
) -> DataFrame:
    """Rank candidate sort keys by how well they would cluster the other
    columns — the decision input for choosing a table's sort/cluster
    key at 100 TB (run-length compression and min/max data skipping
    both improve with clustering).

    For candidate ``c`` and measured column ``o``, ``min_runs`` =
    sum over c-groups of distinct ``o`` values inside the group — an
    EXACT lower bound on the number of value runs of ``o`` after
    sorting by ``c`` (each group's rows become contiguous; within a
    group, equal values can always be laid out adjacently). Lower is
    better; ``runs_ratio`` = min_runs / n_rows (1.0 = no clustering
    benefit). No global sort is performed: one partial+final agg per
    candidate, shuffled on the candidate key.

    Returns (candidate, column, n_rows, min_runs, runs_ratio).
    """
    out = None
    for c in candidates:
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.count_distinct(F.col(o)).alias(f"_d_{o}")
            for o in measure_cols
        ]
        g = df.groupBy(F.col(c).alias("_key")).agg(*aggs)
        tot = g.agg(
            F.sum("_n").alias("_rows"),
            *[F.sum(f"_d_{o}").alias(f"_runs_{o}") for o in measure_cols],
        )
        for o in measure_cols:
            row = tot.select(
                F.lit(c).alias("candidate"),
                F.lit(o).alias("column"),
                F.col("_rows").cast("long").alias("n_rows"),
                F.col(f"_runs_{o}").cast("long").alias("min_runs"),
                F.round(
                    F.col(f"_runs_{o}").cast("double")
                    / F.col("_rows").cast("double"),
                    dp,
                ).alias("runs_ratio"),
            )
            out = row if out is None else out.unionByName(row)
    return out
