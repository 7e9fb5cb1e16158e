import pyarrow.parquet as pq
from pyspark.sql import functions as F

from hybridbackend_spark.operators.layout import (
    cluster_by_zorder,
    column_bounds,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    # bits=2, 2 cols, bounds [0,3] each: scaled == value; key interleaves
    # x bit b -> position 2b, y bit b -> position 2b+1
    df = spark.createDataFrame(
        [(0, 0), (3, 0), (0, 3), (3, 3), (1, 2)], ["x", "y"]
    )
    out = df.withColumn(
        "z", zorder_key(["x", "y"], [(0, 3), (0, 3)], bits=2)
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    # manual morton: z = x0 + 2*y0 + 4*x1 + 8*y1
    def morton(x, y):
        return (x & 1) | ((y & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)
    assert got == {(x, y): morton(x, y) for (x, y) in got}


def test_zorder_key_clamps_and_nulls(spark):
    df = spark.createDataFrame(
        [(100, None), (-5, 2), (None, None)], "x: int, y: int"
    )
    out = df.withColumn(
        "z", zorder_key(["x", "y"], [(0, 3), (0, 3)], bits=2)
    ).collect()
    zs = [r["z"] for r in out]
    assert all(z is not None and 0 <= z < 16 for z in zs)


def test_cluster_by_zorder_narrows_rowgroups_on_both_columns(spark, sf_dir, tmp_path):
    """The pruning claim, measured: after Z-order clustering, the average
    per-file min/max span of BOTH key columns must shrink vs the unsorted
    layout (single-column sort would only narrow one)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    base = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    li.repartition(8).write.mode("overwrite").parquet(base)
    cluster_by_zorder(li, ["l_partkey", "l_suppkey"], bits=8, num_partitions=8)\
        .write.mode("overwrite").parquet(zord)

    def avg_span(path, col):
        import glob
        spans, total = [], 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    if c.path_in_schema == col and c.statistics:
                        spans.append(c.statistics.max - c.statistics.min)
        return sum(spans) / len(spans)

    # 2-D Z-curve over P partitions: each key range covers ~1/P of the
    # plane, so each side narrows toward 1/sqrt(P) (ragged at curve
    # boundaries). Assert BOTH columns narrow, and the covered area
    # (span product — what AND-predicates prune on) collapses.
    ratios = {}
    for col in ("l_partkey", "l_suppkey"):
        plain = avg_span(base, col)
        clustered = avg_span(zord, col)
        ratios[col] = clustered / plain
        assert clustered < plain * 0.8, (col, plain, clustered)
    area = ratios["l_partkey"] * ratios["l_suppkey"]
    assert area < 0.45, ratios


def test_column_bounds_single_job(spark):
    df = spark.createDataFrame([(1, 10.5), (9, -2.0)], ["a", "b"])
    assert column_bounds(df, ["a", "b"]) == [(1.0, 9.0), (-2.0, 10.5)]
