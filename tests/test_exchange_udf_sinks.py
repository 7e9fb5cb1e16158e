import os

import pytest
from pyspark.sql import functions as F

from hybridbackend_spark.functions.udf import (
    register_udfs,
    vec_l2_norm,
    vec_mean_agg,
)
from hybridbackend_spark.operators.exchange import (
    key_skew_report,
    partition_by_dual_modulo_keys,
    partition_by_modulo,
    partition_sizes,
)


def test_partition_by_modulo_colocates(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    parted = partition_by_modulo(df, "k", 8)
    # all rows with the same k % 8 land in the same partition
    check = (
        parted.withColumn("_pid", F.spark_partition_id())
        .withColumn("_bucket", F.pmod("k", F.lit(8)))
        .groupBy("_bucket")
        .agg(F.countDistinct("_pid").alias("n_pids"))
    )
    assert all(r["n_pids"] == 1 for r in check.collect())
    sizes = partition_sizes(parted).collect()
    assert sum(r["n_rows"] for r in sizes) == 1000


def test_dual_modulo_keys(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    intra, inter = partition_by_dual_modulo_keys("k", 4, 5)
    row = df.select(intra.alias("i1"), inter.alias("i2"), "k").filter("k = 13").first()
    assert row["i1"] == 13 % 4 and row["i2"] == (13 // 4) % 5


def test_dual_modulo_keys_exact_above_2_53(spark):
    # keys above 2^53 lose precision in float division; the quotient must
    # use exact integer arithmetic to match the reference's integer
    # dual-modulo placement
    big = (1 << 60) + 12345678901
    df = spark.createDataFrame([(big,)], "k: long")
    intra, inter = partition_by_dual_modulo_keys("k", 7, 11)
    row = df.select(intra.alias("i1"), inter.alias("i2")).first()
    assert row["i1"] == big % 7 and row["i2"] == (big // 7) % 11


def test_key_skew_report(spark):
    df = spark.createDataFrame([(1,)] * 90 + [(2,)] * 10, "k: int")
    top = key_skew_report(df, "k").collect()
    assert top[0]["k"] == 1 and top[0]["n_rows"] == 90


def test_vector_udfs(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (1, [1.0, 0.0]), (2, [0.0, 2.0])],
        "g: int, v: array<double>",
    )
    norms = df.select(vec_l2_norm("v").alias("n")).collect()
    assert sorted(round(r["n"], 6) for r in norms) == [1.0, 2.0, 5.0]
    means = {r["g"]: r["m"] for r in df.groupBy("g").agg(vec_mean_agg("v").alias("m")).collect()}
    assert means[1] == [2.0, 2.0] and means[2] == [0.0, 2.0]


def test_udf_sql_registration(spark):
    register_udfs(spark)
    df = spark.createDataFrame([([6.0, 8.0],)], "v: array<double>")
    df.createOrReplaceTempView("vecs")
    assert spark.sql("SELECT vec_l2_norm(v) AS n FROM vecs").first()["n"] == 10.0


def test_parquet_sink_roundtrip_zstd(spark, tmp_path):
    out = str(tmp_path / "sink_parquet")
    df = spark.range(100).withColumn("part", F.pmod("id", F.lit(4)))
    df.write.mode("overwrite").option("compression", "zstd").partitionBy(
        "part"
    ).parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert len([d for d in os.listdir(out) if d.startswith("part=")]) == 4


def test_orc_roundtrip_and_schema_inference(spark, tmp_path):
    out = str(tmp_path / "sink_orc")
    src = spark.createDataFrame(
        [(1, [1.0, 2.0], "x")], "id: long, vec: array<double>, s: string"
    )
    src.write.mode("overwrite").format("orc").save(out)
    from hybridbackend_spark.sources import read_orc

    back = read_orc(spark, out)
    assert sorted(back.columns) == ["id", "s", "vec"]
    assert back.first()["vec"] == [1.0, 2.0]
    # footer inference on the orc file
    from hybridbackend_spark.schema import infer_fields

    orc_file = next(
        os.path.join(out, f) for f in os.listdir(out) if f.endswith(".orc")
    )
    fields = {f.name: f for f in infer_fields(orc_file)}
    assert fields["vec"].ragged_rank == 1 and fields["vec"].dtype == "float64"


def test_csv_roundtrip(spark, tmp_path):
    out = str(tmp_path / "sink_csv")
    spark.range(10).withColumn("x", F.col("id") * 2).write.mode(
        "overwrite"
    ).option("header", "true").csv(out)
    from hybridbackend_spark.sources import read_csv

    back = read_csv(spark, out, inferSchema="true")
    assert back.count() == 10 and sorted(back.columns) == ["id", "x"]


def test_to_local_iterator_read_path(spark, sf_dir):
    # B4 'read()' equivalent: stream rows without materializing the table
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    it = df.toLocalIterator()
    assert next(it)["r_regionkey"] is not None


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from hybridbackend_spark.operators.exchange import salted_join

    # one gigantic hot key (0) + normal keys
    fact = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, k * 10) for k in range(1, 20)],
        "k: long, payload: long",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(20)], "k: long, attr: string"
    )
    got = sorted(
        map(tuple, salted_join(fact, dim, "k", salt_buckets=4).collect())
    )
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    assert got == want

    # left join keeps unmatched fact rows exactly once
    fact2 = fact.union(spark.createDataFrame([(99, 1)], "k: long, payload: long"))
    got_l = sorted(
        map(tuple, salted_join(fact2, dim, "k", salt_buckets=4, how="left").collect())
    )
    want_l = sorted(map(tuple, fact2.join(dim, "k", "left").collect()))
    assert got_l == want_l


def test_salted_join_spreads_hot_key(spark):
    from pyspark.sql import functions as F

    from hybridbackend_spark.operators.exchange import salted_join

    fact = spark.createDataFrame([(0, i) for i in range(1000)], "k: long, v: long")
    dim = spark.createDataFrame([(0, "hot")], "k: long, attr: string")
    out = salted_join(fact, dim, "k", salt_buckets=8)
    # the hot key's rows must occupy multiple salt sub-keys pre-join:
    # verify by re-deriving the salt distribution on the fact side
    from hybridbackend_spark.operators.exchange import salted_key
    n_salts = (
        fact.withColumn("_s", salted_key("k", 8))
        .select("_s.salt").distinct().count()
    )
    assert n_salts >= 4
    assert out.count() == 1000
