"""Z-order (Morton) clustering keys + layout-benefit measurement.

The multi-dimensional data-layout primitive for 100 TB tables: sorting
(or range-partitioning) a fact table by the bit-interleaved Morton code
of two filter columns gives every 2-D box predicate a CONTIGUOUS key
range whose over-read is bounded, where a linear sort key serves only
its leading column. Delta/Iceberg expose the same idea as OPTIMIZE
ZORDER.

Companion to ``operators/layout.py``: ``layout.zorder_key`` is the
WRITER-side key (normalizes double columns into a fixed-point grid
before interleaving — feeds ``cluster_by_zorder``), and
``layout.sort_key_advisor`` answers the 1-D sort-key question. This
module is the ADVISOR side for 2-D box predicates: it works on
pre-bucketized non-negative ints, where the Morton monotonicity bound
(below) is exactly provable — the double-normalizing path cannot make
that guarantee because ``floor(x / range * top)`` rounds.

Correctness facts used (and oracle-replayed):

- ``spread(x)`` (insert a 0 bit between each payload bit) is strictly
  increasing, and ``morton(x, y) = spread(x) | spread(y) << 1`` is
  monotone in each argument. Hence every point of the box
  ``[x0, x1] × [y0, y1]`` has a Morton code within
  ``[morton(x0, y0), morton(x1, y1)]`` — the single-range scan bound.
- All arithmetic is integer shifts/masks on non-negative values below
  2^(2·bits) — bit-identical in any engine, so the advisor's counts
  are exact and hash-checkable.

Everything is a row-local JVM expression (generated shift/mask terms —
no UDF, no shuffle); the advisor adds one small aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["morton_key", "morton_sql", "zorder_advisor"]


def morton_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton code of two non-negative ints, ``bits`` bits each:
    x occupies even bit positions, y odd. Pure shift/add expression."""
    xl, yl = x.cast("long"), y.cast("long")
    out = None
    for b in range(bits):
        t = F.shiftright(xl, b).bitwiseAND(F.lit(1)) * (1 << (2 * b)) + (
            F.shiftright(yl, b).bitwiseAND(F.lit(1)) * (1 << (2 * b + 1))
        )
        out = t if out is None else out + t
    return out.cast("long")


def morton_sql(x_expr: str, y_expr: str, bits: int = 10) -> str:
    """ANSI-SQL text computing the same Morton code (oracle side)."""
    terms = []
    for b in range(bits):
        terms.append(
            f"((({x_expr}) >> {b}) & 1) * {1 << (2 * b)}"
            f" + ((({y_expr}) >> {b}) & 1) * {1 << (2 * b + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def zorder_advisor(
    df: DataFrame,
    x_col: str,
    y_col: str,
    box: tuple[int, int, int, int],
    bits: int = 10,
) -> DataFrame:
    """Exact layout-benefit readout for a 2-D box predicate
    ``x0 <= x <= x1 AND y0 <= y <= y1`` over non-negative bucketized
    columns (< 2^bits).

    Returns one row: total rows, exact box rows, rows a contiguous
    Morton-range scan would read (``n_zrange``), and rows a linear
    x-leading sort-key range scan would read (``n_xrange``) — i.e. the
    over-read each physical layout pays for this predicate. At 100 TB
    the ratio n_zrange/n_box vs n_xrange/n_box is the decision number
    for choosing ZORDER over a linear sort key."""
    x0, x1, y0, y1 = box
    if not (0 <= x0 <= x1 < (1 << bits) and 0 <= y0 <= y1 < (1 << bits)):
        raise ValueError("box out of range for bits")

    def _m(xv: int, yv: int) -> int:
        out = 0
        for b in range(bits):
            out |= ((xv >> b) & 1) << (2 * b)
            out |= ((yv >> b) & 1) << (2 * b + 1)
        return out

    zlo, zhi = _m(x0, y0), _m(x1, y1)
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    z = morton_key(x, y, bits)
    in_box = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
    return df.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(in_box.cast("long")).alias("n_box"),
        F.sum(((z >= zlo) & (z <= zhi)).cast("long")).alias("n_zrange"),
        F.sum(((x >= x0) & (x <= x1)).cast("long")).alias("n_xrange"),
    )
