"""Bucketed (pre-partitioned) tables: Spark's durable analog of the
reference's static embedding sharding (``embedding/sharding.py:99-131``
pins each key range to a fixed worker; a bucketed table pins each key
hash to a fixed file bucket).

Writing both sides of a recurring join bucketed on the join key by the
same bucket count makes the join SHUFFLE-FREE: Catalyst sees hash
distribution guarantees from the table layout and plans a sort-merge
join with zero Exchange on either side (asserted in
tests/test_plans.py). At 100 TB this converts the dominant repeated cost
(re-shuffling a fact table every run) into a one-time layout cost —
exactly why the reference shards embeddings statically.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: str | Sequence[str],
    num_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Save ``df`` as an external bucketed table at ``path``: data files
    are hash-partitioned into ``num_buckets`` buckets on ``bucket_cols``
    (and sorted within buckets when ``sort`` — which additionally lets
    sort-merge joins skip the per-task sort)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.format(fmt).mode(mode).option("path", path)
    w = w.bucketBy(num_buckets, *cols)
    if sort:
        w = w.sortBy(*cols)
    w.saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its distribution guarantees (a
    plain ``spark.read.parquet(path)`` would lose the bucket metadata —
    the catalog carries it)."""
    return spark.table(table)
