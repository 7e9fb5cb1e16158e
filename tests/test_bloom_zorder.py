"""Bloom-filter and Z-order operator tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hybridbackend_spark.operators.bloom import bloom_build, bloom_probe
from hybridbackend_spark.operators.zorder import (
    morton_key,
    morton_sql,
    zorder_advisor,
)


def _py_pos(key: int, i: int, m_bits: int) -> int:
    """Independent replay of the salted-md5 probe position."""
    h = hashlib.md5(f"b{i}|{key}".encode()).hexdigest()
    return int(h[:15], 16) % m_bits


def test_bloom_no_false_negatives_and_word_packing(spark):
    keys = list(range(0, 500, 7))
    dim = spark.createDataFrame([(k,) for k in keys], "k long")
    filt = bloom_build(dim, "k", m_bits=2048, k=4)
    words = {r.word_idx: r.word for r in filt.collect()}
    # 32 payload bits per int64 word, never the sign bit
    assert all(0 < w < (1 << 32) for w in words.values())
    # filter content replays from the independent hash
    for key in keys[:20]:
        for i in range(4):
            p = _py_pos(key, i, 2048)
            assert (words[p // 32] >> (p % 32)) & 1 == 1
    probe = spark.createDataFrame(
        [(k,) for k in range(500)], "k long"
    )
    out = bloom_probe(probe, "k", filt, m_bits=2048, k=4)
    got = {r.k: r.maybe_member for r in out.collect()}
    # every member passes (no false negatives, the Bloom guarantee)
    assert all(got[k] for k in keys)
    # non-members mostly rejected at these sizes (72 keys in 2048 bits)
    non = [k for k in range(500) if k % 7 != 0]
    fp = sum(got[k] for k in non)
    assert fp < len(non) * 0.1


def test_bloom_m_bits_validation():
    with pytest.raises(ValueError):
        bloom_build(None, "k", m_bits=100)


def _py_morton(x: int, y: int, bits: int = 10) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def test_morton_key_matches_pure_python_and_sql(spark):
    import duckdb

    pts = [(0, 0), (1, 0), (0, 1), (1023, 1023), (37, 901), (512, 256)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y", morton_key(F.col("x"), F.col("y"), 10).alias("z")
    ).collect()
    for r in rows:
        assert r.z == _py_morton(r.x, r.y), (r.x, r.y)
    # oracle-side SQL text computes the same code
    sql = morton_sql("x", "y", 10)
    for x, y in pts:
        (got,) = duckdb.sql(
            f"SELECT {sql} FROM (SELECT {x} AS x, {y} AS y)"
        ).fetchone()
        assert got == _py_morton(x, y)


def test_morton_monotone_box_bound(spark):
    """Every point of a box has its Morton code inside the
    [morton(corner_min), morton(corner_max)] range — the property the
    advisor's single-range scan bound rests on."""
    x0, x1, y0, y1 = 96, 223, 320, 447
    zlo, zhi = _py_morton(x0, y0), _py_morton(x1, y1)
    for x in range(x0, x1 + 1, 13):
        for y in range(y0, y1 + 1, 13):
            assert zlo <= _py_morton(x, y) <= zhi


def test_zorder_advisor_counts(spark):
    rows = [(x, y) for x in range(0, 64, 3) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "xb long, yb long")
    out = zorder_advisor(df, "xb", "yb", box=(8, 15, 16, 31), bits=6)
    r = out.collect()[0]
    n_box = sum(1 for x, y in rows if 8 <= x <= 15 and 16 <= y <= 31)
    n_x = sum(1 for x, _ in rows if 8 <= x <= 15)
    zlo, zhi = _py_morton(8, 16, 6), _py_morton(15, 31, 6)
    n_z = sum(1 for x, y in rows if zlo <= _py_morton(x, y, 6) <= zhi)
    assert (r.n_total, r.n_box, r.n_zrange, r.n_xrange) == (
        len(rows),
        n_box,
        n_z,
        n_x,
    )
    # the range bound always covers the box
    assert r.n_zrange >= r.n_box


def test_zorder_advisor_box_validation(spark):
    df = None
    with pytest.raises(ValueError):
        zorder_advisor(df, "x", "y", box=(0, 64, 0, 10), bits=6)
