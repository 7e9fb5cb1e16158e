from pyspark.sql import functions as F

from hybridbackend_spark.operators.sketch import cms_build, cms_merge, cms_query


def _stream(spark):
    # zipf-ish: token i appears (40 - i) times
    rows = []
    for i in range(40):
        rows += [(f"tok{i}",)] * (40 - i)
    return spark.createDataFrame(rows, "k: string")


def test_cms_upper_bound_and_heavy_hitter_accuracy(spark):
    df = _stream(spark)
    cms = cms_build(df, "k", width=64, depth=4)
    keys = df.distinct()
    est = {r["k"]: r["cms_estimate"] for r in
           cms_query(cms, keys, "k", width=64, depth=4).collect()}
    exact = {r["k"]: r["n"] for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    # CMS never underestimates
    assert all(est[k] >= exact[k] for k in exact)
    # with width >> heavy mass the top token is exact or near-exact
    assert est["tok0"] <= exact["tok0"] + sum(exact.values()) // 64 * 4


def test_cms_merge_equals_full_build(spark):
    df = _stream(spark)
    a = df.filter(F.xxhash64("k") % 2 == 0)
    b = df.filter(F.xxhash64("k") % 2 != 0)
    merged = cms_merge(
        cms_build(a, "k", width=32, depth=3),
        cms_build(b, "k", width=32, depth=3),
    )
    full = cms_build(df, "k", width=32, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_cms_weighted_counts(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], ["k", "w"])
    cms = cms_build(df, "k", width=16, depth=2, weight_col="w")
    est = {r["k"]: r["cms_estimate"] for r in
           cms_query(cms, df.select("k").distinct(), "k", width=16, depth=2).collect()}
    assert est["a"] >= 12 and est["b"] >= 1
