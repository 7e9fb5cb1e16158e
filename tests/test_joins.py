import datetime

from pyspark.sql import functions as F

from hybridbackend_spark.operators.joins import (
    asof_join,
    clip_history,
    left_join_with_default,
    lookup_join,
    pooled_lookup,
)


def _dim(spark):
    return spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [10.0, 20.0]), (2, [100.0, 200.0])],
        "id: long, vec: array<double>",
    )


def test_lookup_join_dedup(spark):
    fact = spark.createDataFrame([(i % 3,) for i in range(30)], "id: long")
    out = lookup_join(fact, _dim(spark), "id")
    assert out.count() == 30
    got = out.filter(F.col("id") == 1).select("vec").first()[0]
    assert got == [10.0, 20.0]


def test_lookup_join_matches_plain_join(spark):
    fact = spark.createDataFrame([(i % 3,) for i in range(30)], "id: long")
    a = sorted(map(tuple, lookup_join(fact, _dim(spark), "id").collect()))
    b = sorted(map(tuple, fact.join(_dim(spark), "id").collect()))
    assert a == b


def test_pooled_lookup_sum_and_mean(spark):
    fact = spark.createDataFrame(
        [(1, [0, 1]), (2, [2]), (3, [])],
        "row_id: long, ids: array<long>",
    )
    out = pooled_lookup(fact, _dim(spark), "ids", "row_id", "vec", combiner="sum")
    got = {r["row_id"]: r["vec"] for r in out.collect()}
    assert got[1] == [11.0, 22.0]
    assert got[2] == [100.0, 200.0]
    mean = pooled_lookup(fact, _dim(spark), "ids", "row_id", "vec", combiner="mean")
    gm = {r["row_id"]: r["vec"] for r in mean.collect()}
    assert gm[1] == [5.5, 11.0]


def test_left_join_with_default(spark):
    left = spark.createDataFrame([(1,), (2,)], "k: long")
    right = spark.createDataFrame([(1, [7])], "k: long, hist: array<int>")
    out = left_join_with_default(left, right, "k", {"hist": F.array()})
    got = {r["k"]: r["hist"] for r in out.collect()}
    assert got[1] == [7] and got[2] == []


def test_clip_history(spark):
    df = spark.createDataFrame(
        [([1, 5, 9], ["a", "b", "c"], 10)],
        "ts: array<int>, vals: array<string>, anchor: int",
    )
    out = df.select(clip_history("ts", "vals", "anchor", 6).alias("kept"))
    # keep ts in [4, 10): 5, 9
    assert out.collect()[0]["kept"] == ["b", "c"]


def test_asof_join_backward(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 5, "p3")],
        "k: long, t: long, lv: string",
    )
    right = spark.createDataFrame(
        [(1, 8, "c1"), (1, 15, "c2"), (1, 20, "c3"), (2, 9, "c4")],
        "k: long, rt: long, rv: string",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    got = {r["lv"]: r["rv"] for r in out.collect()}
    # at-or-before semantics: p2(t=20) matches c3(rt=20); p3(t=5) has no prior
    assert got == {"p1": "c1", "p2": "c3", "p3": None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([(1, 100, "x")], "k: long, t: long, lv: string")
    right = spark.createDataFrame([(1, 10, "old")], "k: long, rt: long, rv: string")
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt", tolerance=50)
    assert out.collect()[0]["rv"] is None


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, 10, "p")], "k: long, t: long, lv: string")
    right = spark.createDataFrame(
        [(1, 9, "before"), (1, 12, "after"), (1, 30, "later")],
        "k: long, rt: long, rv: string",
    )
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt",
                    direction="forward")
    assert out.collect()[0]["rv"] == "after"


def test_interval_join_matches_naive_nonequi(spark):
    """Differential: bucketed interval join == naive non-equi join on
    random data, including boundary rows (ts == start kept, ts == end
    dropped) and intervals spanning multiple buckets."""
    import random

    from hybridbackend_spark.operators.joins import interval_join

    rng = random.Random(11)
    base = 1_700_000_000
    pts = [(i, base + rng.randrange(0, 100_000)) for i in range(200)]
    ivs = []
    for j in range(60):
        s = base + rng.randrange(0, 100_000)
        ivs.append((j, s, s + rng.randrange(1, 40_000)))  # up to 4 buckets @ w=10000s
    # force exact boundary hits
    ivs.append((60, pts[0][1], pts[0][1] + 50))      # ts == start -> match
    ivs.append((61, pts[1][1] - 50, pts[1][1]))      # ts == end   -> no match
    ivs.append((62, pts[2][1], pts[2][1]))           # empty interval -> no match
    ivs.append((63, pts[3][1] + 10, pts[3][1] - 10)) # inverted -> no match
    p = spark.createDataFrame(pts, ["pid", "ts_s"]).selectExpr(
        "pid", "timestamp_seconds(ts_s) AS ts"
    )
    iv = spark.createDataFrame(ivs, ["wid", "s_s", "e_s"]).selectExpr(
        "wid", "timestamp_seconds(s_s) AS w_start", "timestamp_seconds(e_s) AS w_end"
    )
    got = {
        (r["pid"], r["wid"])
        for r in interval_join(p, iv, "ts", "w_start", "w_end", 10_000)
        .select("pid", "wid")
        .collect()
    }
    want = {
        (r["pid"], r["wid"])
        for r in p.join(
            iv, (p.ts >= iv.w_start) & (p.ts < iv.w_end)
        ).select("pid", "wid").collect()
    }
    assert got == want
    assert (0, 60) in got and (1, 61) not in got


def test_interval_join_no_cartesian_plan(spark):
    from hybridbackend_spark.operators.joins import interval_join
    from hybridbackend_spark.plans.inspect import physical_plan

    p = spark.range(10).selectExpr("id AS pid", "timestamp_seconds(id * 100) AS ts")
    iv = spark.range(5).selectExpr(
        "id AS wid",
        "timestamp_seconds(id * 200) AS w_start",
        "timestamp_seconds(id * 200 + 300) AS w_end",
    )
    plan = physical_plan(interval_join(p, iv, "ts", "w_start", "w_end", 300))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_forward_inclusive_and_tolerance(spark):
    import datetime

    from pyspark.sql import functions as F

    from hybridbackend_spark.operators.joins import asof_join

    t = lambda sec: datetime.datetime(2024, 1, 1, 0, 0, sec)
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(30), "b"), (2, t(5), "c")],
        ["k", "lts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, t(10), 100), (1, t(25), 200), (1, t(50), 300)],
        ["k", "rts", "val"],
    )
    out = {
        r["tag"]: r["val"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts",
            direction="forward",
        ).collect()
    }
    # inclusive at equality (a@10 -> right@10); earliest-after otherwise
    assert out == {"a": 100, "b": 300, "c": None}
    # forward tolerance (numeric ts, same units contract): b@30 ->
    # right@50 is 20 ahead, outside a 15 tolerance; a@10 matches at gap 0
    nl = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 5, "c")], ["k", "lts", "tag"]
    )
    nr = spark.createDataFrame(
        [(1, 10, 100), (1, 25, 200), (1, 50, 300)], ["k", "rts", "val"]
    )
    tol = {
        r["tag"]: r["val"]
        for r in asof_join(
            nl, nr, on="k", left_ts="lts", right_ts="rts",
            direction="forward", tolerance=15,
        ).collect()
    }
    assert tol == {"a": 100, "b": None, "c": None}


def test_fuzzy_join_exact_recall_d1(spark):
    from hybridbackend_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame(
        [(1, "kitten"), (2, "flamingo"), (3, "spark")],
        ["lid", "name"],
    )
    right = spark.createDataFrame(
        [(10, "mitten"),    # kitten: 1 sub
         (11, "kitten"),    # exact
         (12, "kittens"),   # 1 insert
         (13, "sitting"),   # kitten: 3 edits -> no match
         (14, "spank")],    # spark: 1 substitution
        ["rid", "name"],
    )
    out = fuzzy_join(
        left, right, "name", "name",
        max_distance=1, left_id="lid", right_id="rid",
    )
    got = {(r["lid_left" if "lid_left" in r else "lid"], r["rid"]): r["distance"]
           for r in out.collect()}
    assert got == {(1, 10): 1, (1, 11): 0, (1, 12): 1, (3, 14): 1}


def test_fuzzy_join_d2_substitutions(spark):
    from hybridbackend_spark.operators.joins import fuzzy_join

    left = spark.createDataFrame([(1, "spark")], ["lid", "name"])
    right = spark.createDataFrame(
        [(20, "spank"), (21, "shark"), (22, "sparkling")],
        ["rid", "name"],
    )
    out = fuzzy_join(
        left, right, "name", "name",
        max_distance=2, left_id="lid", right_id="rid",
    )
    got = {r["rid"]: r["distance"] for r in out.collect()}
    # spank (2 edits? s-p-a-r-k vs s-p-a-n-k = 1 sub), shark 1 sub,
    # sparkling = 4 inserts -> excluded
    assert got == {20: 1, 21: 1}


def test_fuzzy_join_matches_bruteforce(spark):
    """Blocking recall check: symmetric-delete join == naive cross join
    + levenshtein filter on a random-ish corpus."""
    from hybridbackend_spark.operators.joins import fuzzy_join

    words = ["alpha", "alpka", "beta", "betta", "gamma", "gamm",
             "delta", "dalta", "epsilon", "epsilom"]
    left = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["lid", "name"]
    )
    right = spark.createDataFrame(
        [(100 + i, w) for i, w in enumerate(words)], ["rid", "name"]
    )
    out = fuzzy_join(left, right, "name", "name",
                     max_distance=1, left_id="lid", right_id="rid")
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    expect = set()
    def lev(a, b):
        import functools
        @functools.lru_cache(None)
        def d(i, j):
            if i == 0: return j
            if j == 0: return i
            return min(d(i-1, j) + 1, d(i, j-1) + 1,
                       d(i-1, j-1) + (a[i-1] != b[j-1]))
        return d(len(a), len(b))
    for i, wa in enumerate(words):
        for j, wb in enumerate(words):
            if lev(wa, wb) <= 1:
                expect.add((i, 100 + j))
    assert got == expect


def test_point_in_time_join_no_leakage(spark):
    import datetime as dt

    from hybridbackend_spark.operators.joins import point_in_time_join

    t0 = dt.datetime(2024, 1, 1)
    dim = spark.createDataFrame(
        [
            (1, "bronze", t0, t0 + dt.timedelta(days=10), 1),
            (1, "gold", t0 + dt.timedelta(days=10), None, 2),
        ],
        "user_id: long, state: string, valid_from: timestamp, "
        "valid_to: timestamp, version: int",
    )
    facts = spark.createDataFrame(
        [
            (100, 1, t0 + dt.timedelta(days=5)),    # inside v1
            (101, 1, t0 + dt.timedelta(days=10)),   # boundary -> v2 (half-open)
            (102, 1, t0 + dt.timedelta(days=50)),   # open current -> v2
            (103, 1, t0 - dt.timedelta(days=1)),    # before history -> null
            (104, 7, t0 + dt.timedelta(days=5)),    # unknown key -> null
        ],
        "event_id: long, user_id: long, ts: timestamp",
    )
    out = {r["event_id"]: (r["state"], r["version"])
           for r in point_in_time_join(facts, dim, "user_id", "ts").collect()}
    assert out[100] == ("bronze", 1)
    assert out[101] == ("gold", 2)   # never the PAST-future value: as-of semantics
    assert out[102] == ("gold", 2)
    assert out[103] == (None, None)
    assert out[104] == (None, None)
