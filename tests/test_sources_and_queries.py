from hybridbackend_spark.schema import Field
from hybridbackend_spark.sources import read_parquet


def test_read_parquet_projection(spark, sf_dir):
    df = read_parquet(
        spark,
        f"{sf_dir}/lineitem.parquet",
        fields=[Field("l_orderkey", "int64"), Field("l_quantity", "float64")],
    )
    assert df.columns == ["l_orderkey", "l_quantity"]
    assert df.count() > 0


def test_read_parquet_default_population(spark, sf_dir):
    df = read_parquet(
        spark,
        f"{sf_dir}/lineitem.parquet",
        fields=[
            Field("l_orderkey", "int64"),
            Field("extra_col", "float64", default_value=1.5),
        ],
    )
    assert df.select("extra_col").first()[0] == 1.5


def test_read_parquet_to_dense_from_shape(spark, sf_dir):
    # to_dense=True pads ragged columns to the field's declared fixed shape
    df = read_parquet(
        spark,
        f"{sf_dir}/embeddings.parquet",
        fields=[Field("vec_id", "int64"), Field("embedding", "float32", shape=(80,))],
        to_dense=True,
    )
    lens = df.selectExpr("size(embedding) as n").distinct().collect()
    assert [r["n"] for r in lens] == [80]


def test_read_parquet_to_dense_string_fill(spark, tmp_path):
    # string-array fields pad with "" (dtype-derived fill), not int 0
    p = str(tmp_path / "s.parquet")
    spark.createDataFrame([(1, ["a"]), (2, ["b", "c", "d"])], "id: long, xs: array<string>").write.parquet(p)
    df = read_parquet(
        spark,
        p,
        fields=[Field("id", "int64"), Field("xs", "string", ragged_rank=1)],
        to_dense={"xs": 3},
    )
    got = {r["id"]: r["xs"] for r in df.collect()}
    assert got[1] == ["a", "", ""] and got[2] == ["b", "c", "d"]


def test_read_parquet_ignore_case(spark, sf_dir):
    df = read_parquet(
        spark,
        f"{sf_dir}/lineitem.parquet",
        fields=[Field("L_ORDERKEY", "int64")],
        field_ignore_case=True,
    )
    # file-side casing wins (reference lowercases the declared spec)
    assert df.columns == ["l_orderkey"]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracle_names = set(e.oracle_sql())
    assert oracle_names <= names
    assert len(names) >= 20


def test_projection_pushdown_plan(spark, sf_dir):
    """Scale check: projection must prune the parquet ReadSchema."""
    df = read_parquet(
        spark,
        f"{sf_dir}/lineitem.parquet",
        fields=[Field("l_orderkey", "int64")],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_quantity" not in plan
