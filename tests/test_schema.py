import pytest
from pyspark.sql import types as T

from hybridbackend_spark.schema import (
    Field,
    SchemaMismatchError,
    fields_to_struct,
    infer_fields,
    merge_fields,
    validate_files,
)


def test_field_spark_types():
    assert Field("a", "int64").spark_type == T.LongType()
    assert Field("b", "float32", ragged_rank=1).spark_type == T.ArrayType(T.FloatType())
    assert Field("c", "string", ragged_rank=2).spark_type == T.ArrayType(
        T.ArrayType(T.StringType())
    )
    # fixed-shape list maps to a single array level
    assert Field("d", "int32", shape=(4,)).spark_type == T.ArrayType(T.IntegerType())
    # unsigned widening
    assert Field("e", "uint32").spark_type == T.LongType()
    assert Field("f", "uint64").spark_type == T.DecimalType(20, 0)


def test_field_invalid():
    with pytest.raises(ValueError):
        Field("a", "complex128")
    with pytest.raises(ValueError):
        Field("a", "int64", ragged_rank=1, shape=(3,))


def test_fields_to_struct_dupes():
    with pytest.raises(SchemaMismatchError):
        fields_to_struct([Field("a"), Field("a")])


def test_infer_fields(sf_dir):
    fields = {f.name: f for f in infer_fields(f"{sf_dir}/embeddings.parquet")}
    assert fields["vec_id"].dtype == "int64"
    assert fields["embedding"].dtype == "float32"
    assert fields["embedding"].ragged_rank == 1
    assert fields["label"].dtype == "int32"


def test_merge_fields_mismatch(sf_dir):
    inferred = infer_fields(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(SchemaMismatchError):
        merge_fields([Field("vec_id", "string")], inferred)
    # absent without default -> error; absent with default -> kept
    with pytest.raises(SchemaMismatchError):
        merge_fields([Field("nope", "int64")], inferred)
    merged = merge_fields([Field("nope", "int64", default_value=7)], inferred)
    assert merged[0].default_value == 7


def test_validate_files(sf_dir):
    same = [f"{sf_dir}/lineitem.parquet", f"{sf_dir}/lineitem.parquet"]
    assert validate_files(same) == []
    diff = [f"{sf_dir}/lineitem.parquet", f"{sf_dir}/orders.parquet"]
    assert len(validate_files(diff)) > 0


def test_validate_files_shape_mismatch(tmp_path):
    """Reference CLI parity (data/validate.py:68-71): two files agreeing
    on name/dtype/rank but differing in DECLARED FIXED SHAPE
    (fixed_size_list footer type) must produce a problem line; a
    fixed-vs-ragged list difference reports as a rank problem."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def w(name, typ, data):
        p = str(tmp_path / name)
        pq.write_table(pa.table({"e": pa.array(data, type=typ)}), p)
        return p

    f2 = w("f2.parquet", pa.list_(pa.float32(), 2), [[1.0, 2.0]])
    f3 = w("f3.parquet", pa.list_(pa.float32(), 3), [[1.0, 2.0, 3.0]])
    rag = w("rag.parquet", pa.list_(pa.float32()), [[1.0, 2.0]])

    assert validate_files([f2, f2]) == []
    probs = validate_files([f2, f3])
    assert len(probs) == 1 and "shape" in probs[0]
    # fixed (rank 0 + shape) vs ragged (rank 1) surfaces as rank
    assert any("rank" in p for p in validate_files([f2, rag]))
    # inference: fixed_size_list -> rank 0 + shape dims
    fld = infer_fields(f2)[0]
    assert (fld.ragged_rank, fld.shape, fld.dtype) == (0, (2,), "float32")


def test_merge_fields_file_declared_shape(tmp_path):
    """A file whose footer declares a fixed shape merges with a declared
    shape=(k,) field (both are one array level); a conflicting declared
    shape raises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "f.parquet")
    pq.write_table(
        pa.table({"e": pa.array([[1.0, 2.0]], type=pa.list_(pa.float32(), 2))}),
        p,
    )
    inferred = infer_fields(p)
    merged = merge_fields([Field("e", "float32", shape=(2,))], inferred)
    assert merged[0].shape == (2,)
    with pytest.raises(SchemaMismatchError, match="shape"):
        merge_fields([Field("e", "float32", shape=(3,))], inferred)


def test_validate_cli_main(sf_dir, capsys):
    from hybridbackend_spark.sources.validate import main

    a = f"{sf_dir}/lineitem.parquet"
    b = f"{sf_dir}/orders.parquet"
    # consistent single file -> exit 0
    assert main([a, a]) == 0
    assert "OK" in capsys.readouterr().out
    # mismatched schemas -> nonzero + report lines
    assert main([a, b]) == 1
    assert capsys.readouterr().out.strip()
    # --print-schema renders the resolved field list
    assert main([a, "--print-schema"]) == 0
    out = capsys.readouterr().out
    assert "l_orderkey" in out and "ragged_rank=0" in out


def test_narrow_uint64_roundtrip(spark, tmp_path):
    """widen_uint64_to='long': uint64 parquet surfaces as DECIMAL(20,0)
    by default; the opt-in narrows to BIGINT when values fit, and the
    overflow guard RAISES (not wraps) on a value above Long.MAX."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hybridbackend_spark.sources.tabular import narrow_uint64, read_parquet

    ok = str(tmp_path / "ok.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2, 2**63 - 1], type=pa.uint64())}), ok
    )
    dec = read_parquet(spark, ok)
    assert dec.schema["id"].dataType == T.DecimalType(20, 0)
    nar = read_parquet(spark, ok, widen_uint64_to="long")
    assert nar.schema["id"].dataType == T.LongType()
    assert sorted(r.id for r in nar.collect()) == [1, 2, 2**63 - 1]
    # non-decimal columns pass through untouched unless explicitly named
    assert narrow_uint64(dec.withColumn("s", dec.id.cast("string"))).schema[
        "s"
    ].dataType == T.StringType()
    with pytest.raises(ValueError):
        narrow_uint64(dec.withColumn("s", dec.id.cast("string")), columns=["s"])
    # a typo'd column name raises instead of silently skipping the
    # narrowing (the wrong-type case above already raised; this pins
    # the missing-name case to the same contract)
    with pytest.raises(ValueError, match="not in schema"):
        narrow_uint64(dec, columns=["idd"])

    bad = str(tmp_path / "bad.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2**63], type=pa.uint64())}), bad
    )
    with pytest.raises(Exception, match="BIGINT range"):
        read_parquet(spark, bad, widen_uint64_to="long").collect()
    with pytest.raises(ValueError, match="decimal"):
        read_parquet(spark, ok, widen_uint64_to="float")


def test_validate_cli_values_flag(spark, sf_dir, tmp_path, capsys):
    """--values (round-11) extends the footer-only CLI with the
    corrupt-scale data scan: clean data exits 0 with per-column OK
    lines; planted corruption exits 1 and names the dirty column; a
    floatless file is a stated skip, not a silent pass."""
    from hybridbackend_spark.sources.validate import main

    ev = f"{sf_dir}/events.parquet"
    assert main([ev, "--values"]) == 0
    out = capsys.readouterr().out
    assert "values: OK    value:" in out and "DIRTY" not in out

    bad = str(tmp_path / "bad.parquet")
    spark.createDataFrame(
        [(1, 1.5), (2, float("inf")), (3, 1e300)], "id long, v double"
    ).coalesce(1).write.parquet(bad)
    assert main(["--glob", f"{bad}/part-*.parquet", "--values"]) == 1
    out = capsys.readouterr().out
    assert "values: DIRTY v:" in out and "inf=1" in out \
        and "out_of_range=1" in out

    nofloat = str(tmp_path / "nofloat.parquet")
    spark.createDataFrame([(1, "a")], "id long, s string").coalesce(
        1
    ).write.parquet(nofloat)
    assert main(["--glob", f"{nofloat}/part-*.parquet", "--values"]) == 0
    assert "values: skipped" in capsys.readouterr().out
