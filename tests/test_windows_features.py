import datetime

import pytest
from pyspark.sql import functions as F

from hybridbackend_spark.functions.feature import (
    concat_features,
    hash_bucket,
    impute,
    log1p_feature,
    mod_bucket,
    normalize,
)
from hybridbackend_spark.functions.windows import (
    ordered_collect,
    run_length_ids,
    sessionize,
)


def test_impute(spark):
    df = spark.createDataFrame([(5.0,), (-1.0,), (None,)], "x: double")
    out = [r[0] for r in df.select(impute("x", default=0.0)).collect()]
    assert out == [5.0, 0.0, 0.0]


def test_mod_and_hash_bucket(spark):
    df = spark.createDataFrame([(-7,), (7,)], "x: long")
    mods = [r[0] for r in df.select(mod_bucket("x", 5)).collect()]
    assert mods == [3, 2]  # pmod keeps buckets non-negative
    hashes = [r[0] for r in df.select(hash_bucket("x", 5)).collect()]
    assert all(0 <= h < 5 for h in hashes)


def test_concat_features(spark):
    df = spark.createDataFrame([(1, 2.5)], "a: long, b: double")
    assert df.select(concat_features("a", "b")).collect()[0][0] == [1.0, 2.5]


def test_run_length_ids(spark):
    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "a"), (2, 1, "z")],
        "k: long, t: long, v: string",
    )
    out = {(r["k"], r["t"]): r["run_id"] for r in
           run_length_ids(df, "k", "t", "v").collect()}
    assert out == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (1, 4): 3, (2, 1): 1}


def test_sessionize(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(seconds=100)),
        (1, base + datetime.timedelta(seconds=5000)),
    ]
    df = spark.createDataFrame(rows, "k: long, ts: timestamp")
    out = sorted(r["session_id"] for r in
                 sessionize(df, "k", "ts", gap_seconds=1800).collect())
    assert out == [1, 1, 2]


def test_ordered_collect(spark):
    df = spark.createDataFrame(
        [(1, 3, "c"), (1, 1, "a"), (1, 2, "b")], "k: long, t: long, v: string"
    )
    got = ordered_collect(df, "k", "t", "v").collect()[0]["items"]
    assert got == ["a", "b", "c"]


def test_dataspec_json_roundtrip_and_flags(spark, tmp_path):
    # reference DataSpec.read format (docs/tutorial/ranking/data.py:46-66)
    import json

    from hybridbackend_spark.functions.spec import DataSpec

    spec_json = [
        {"name": "x", "dtype": "float64", "default": 0, "log": True,
         "norm": 10.0},
        {"name": "cat", "dtype": "int64", "default": 0,
         "embedding": {"size": 8, "dimension": 4}},
        {"name": "tags", "dtype": "int64", "type": "list", "default": 0,
         "embedding": {"size": 8, "dimension": 4}},
    ]
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec_json))
    spec = DataSpec.read(str(p))
    assert spec.embedding_sizes == {"x": None, "cat": 8, "tags": 8}
    assert spec.embedding_dims["cat"] == 4
    assert spec.norms["x"] == 10.0

    df = spark.createDataFrame(
        [(4.0, 10, [9, -3]), (-1.0, -5, [17, 2])], ["x", "cat", "tags"]
    )
    out = {
        (round(r["x"], 9), r["cat"], tuple(r["tags"]))
        for r in spec.apply(df).collect()
    }
    import math

    # x: impute(-1 -> 0) -> log1p -> /10; cat: impute -> %8; tags: per-elem
    assert (round(math.log1p(4.0) / 10.0, 9), 2, (1, 0)) in out  # -3 imputed to 0 first
    assert (round(math.log1p(0.0) / 10.0, 9), 0, (1, 2)) in out

    # disable flags: raw passthrough apart from dtype cast / bucketing
    plain = DataSpec(spec_json, disable_imputation=True,
                     disable_transform=True)
    vals = {tuple(r)[:2] for r in plain.apply(df).collect()}
    assert (4.0, 2) in vals and (-1.0, -5 % 8) in vals

    # override_embedding_size rebuckets every categorical
    small = DataSpec(spec_json, override_embedding_size=2)
    assert small.embedding_sizes["cat"] == 2


def test_funnel_min_times_semantics(spark):
    """Hand-built funnel: converting user, out-of-window user, wrong-order
    user, and a repeat-stage user whose FIRST qualifying event counts."""
    from hybridbackend_spark.functions.windows import funnel_min_times

    rows = [
        # u1 converts: view@0, click@10m, purchase@30m
        (1, 0, "view"), (1, 600, "click"), (1, 1800, "purchase"),
        # u2 clicks too late (>1h after view)
        (2, 0, "view"), (2, 4000, "click"),
        # u3 wrong order: click before view, no click after
        (3, 500, "click"), (3, 600, "view"),
        # u4 two clicks; the FIRST (t=100) anchors the purchase window,
        # and t=3700 == 100+3600 sits exactly ON the inclusive boundary
        (4, 0, "view"), (4, 100, "click"), (4, 3000, "click"),
        (4, 3700, "purchase"),
        # u5 same shape but purchase 1s past the boundary -> out
        (5, 0, "view"), (5, 100, "click"), (5, 3701, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "s", "event_type"]).selectExpr(
        "user_id", "timestamp_seconds(s) AS ts", "event_type"
    )
    v, c, p = funnel_min_times(
        df, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )
    assert {r["user_id"] for r in v.collect()} == {1, 2, 3, 4, 5}
    assert {r["user_id"] for r in c.collect()} == {1, 4, 5}
    assert {r["user_id"] for r in p.collect()} == {1, 4}


def test_time_decayed_sum_exact_halflife(spark):
    import datetime

    from hybridbackend_spark.functions.windows import time_decayed_sum

    base = datetime.datetime(2001, 5, 10, 12, 0, 0)
    rows = [
        # user 1: 10.0 today, 10.0 one day ago, 10.0 two days ago
        (1, base, 10.0),
        (1, base - datetime.timedelta(days=1), 10.0),
        (1, base - datetime.timedelta(days=2), 10.0),
        # user 2: a single event 40 days before its anchor is outside the
        # 30-day horizon -> weight 0 (anchor is its own last event: 5.0)
        (2, base, 5.0),
        (2, base - datetime.timedelta(days=40), 100.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    out = {
        r["user_id"]: r["decayed_value"]
        for r in time_decayed_sum(df, "user_id", "ts", "value").collect()
    }
    # 10*1 + 10*0.5 + 10*0.25 = 17.5
    assert out[1] == 17.5
    assert out[2] == 5.0


def test_time_decayed_sum_partition_invariant(spark):
    import datetime

    from hybridbackend_spark.functions.windows import time_decayed_sum

    base = datetime.datetime(2001, 5, 10)
    rows = [
        (u, base - datetime.timedelta(days=d, seconds=u), float(u * d % 37) / 7)
        for u in range(1, 20)
        for d in range(0, 45, 3)
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    a = sorted(time_decayed_sum(df, "user_id", "ts", "value").collect())
    b = sorted(
        time_decayed_sum(
            df.repartition(13, "value"), "user_id", "ts", "value"
        ).collect()
    )
    assert a == b


def test_rolling_distinct_count_window_semantics(spark):
    import datetime

    from hybridbackend_spark.functions.windows import rolling_distinct_count

    d = lambda day: datetime.datetime(2024, 1, day, 12, 0, 0)
    rows = [
        (1, d(1)), (1, d(1)),       # u1 active day 1 (dup event)
        (1, d(5)),                  # u1 again day 5
        (2, d(1)),                  # u2 only day 1
        (3, d(20)),                 # u3 in a far window
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        str(r["day"]): r["active_ids"]
        for r in rolling_distinct_count(df, "ts", "user_id", 7).collect()
    }
    # day 1: u1+u2; day 5: u1 (from day1 AND day5, counted once) + u2 (day1
    # still inside the trailing 7 days); day 20: only u3
    assert got == {"2024-01-01": 2, "2024-01-05": 2, "2024-01-20": 1}


def test_rolling_distinct_sketch_within_error_of_exact(spark):
    import random

    from hybridbackend_spark.functions.windows import (
        rolling_distinct_count,
        rolling_distinct_count_sketch,
    )

    rng = random.Random(13)
    rows = []
    base = "2024-01-"
    for day in range(1, 29):
        for _ in range(rng.randint(50, 400)):
            rows.append(
                (f"2024-01-{day:02d} 12:00:00", rng.randint(0, 3000))
            )
    df = spark.createDataFrame(rows, "ts: string, user_id: long").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    exact = {
        r["day"]: r["active_ids"]
        for r in rolling_distinct_count(df, "ts", "user_id", 7).collect()
    }
    approx = {
        r["day"]: r["active_ids"]
        for r in rolling_distinct_count_sketch(
            df, "ts", "user_id", 7
        ).collect()
    }
    assert set(exact) == set(approx)  # same observed-day spine
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(5, 0.05 * n), (
            f"{day}: exact {n} vs sketch {approx[day]}"
        )


def test_rolling_distinct_sketch_window_guard(spark):
    from hybridbackend_spark.functions.windows import (
        rolling_distinct_count_sketch,
    )

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1)], "ts: string, user_id: long"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    with pytest.raises(ValueError):
        rolling_distinct_count_sketch(df, "ts", "user_id", 0)


def test_resample_fill_ffill_and_linear(spark):
    from hybridbackend_spark.operators.timeseries import resample_fill

    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", base, 10.0),
        ("a", base + dt.timedelta(hours=3), 40.0),  # 2-hour gap
        ("b", base, 5.0),
        ("b", base + dt.timedelta(hours=1), 7.0),   # no gap
    ]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, v: double")

    ff = resample_fill(df, "k", "ts", "v", 3600, how="ffill")
    got = {(r["k"], r["bucket_ts"]): (r["value"], r["filled"]) for r in ff.collect()}
    t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
    # timestamps are session-TZ; recompute t0 from the result's min bucket
    t0 = min(b for (_, b) in got)
    assert got[("a", t0)] == (10.0, False)
    assert got[("a", t0 + 3600)] == (10.0, True)
    assert got[("a", t0 + 7200)] == (10.0, True)
    assert got[("a", t0 + 10800)] == (40.0, False)
    assert got[("b", t0 + 3600)] == (7.0, False)
    assert len([1 for (k, _) in got if k == "b"]) == 2  # no fill needed

    lin = resample_fill(df, "k", "ts", "v", 3600, how="linear")
    got_l = {(r["k"], r["bucket_ts"]): r["value"] for r in lin.collect()}
    assert got_l[("a", t0 + 3600)] == 20.0
    assert got_l[("a", t0 + 7200)] == 30.0


def test_resample_fill_aggregates_bucket_first(spark):
    from hybridbackend_spark.operators.timeseries import resample_fill

    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", base + dt.timedelta(minutes=m), 1.0) for m in (0, 10, 50)
    ]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, v: double")
    out = resample_fill(df, "k", "ts", "v", 3600, how="ffill").collect()
    assert len(out) == 1 and out[0]["value"] == 3.0  # summed into one bucket


def test_standard_scale_matches_numpy(spark):
    import math

    from hybridbackend_spark.functions.feature import standard_scale

    vals = [1.25, 2.5, 3.75, 10.0, -4.5, 0.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "x"])
    out = {r["i"]: r["x_z"] for r in standard_scale(df, ["x"]).collect()}
    n = len(vals)
    mean = sum(vals) / n
    std = math.sqrt(sum((v - mean) ** 2 for v in vals) / n)
    for i, v in enumerate(vals):
        assert abs(out[i] - (v - mean) / std) < 1e-6


def test_standard_scale_zero_variance_yields_null(spark):
    from hybridbackend_spark.functions.feature import standard_scale

    df = spark.createDataFrame([(1, 5.0), (2, 5.0)], ["i", "x"])
    out = standard_scale(df, ["x"]).collect()
    assert all(r["x_z"] is None for r in out)


def test_standard_scale_partitioning_invariant(spark):
    from hybridbackend_spark.functions.feature import standard_scale

    rows = [(i, (i * 37 % 101) / 7.0) for i in range(500)]
    df = spark.createDataFrame(rows, ["i", "x"])
    a = sorted((r["i"], r["x_z"]) for r in standard_scale(df, ["x"]).collect())
    b = sorted(
        (r["i"], r["x_z"])
        for r in standard_scale(df.repartition(13, "x"), ["x"]).collect()
    )
    assert a == b  # exact integer stats -> bit-stable across layouts


def test_transition_matrix_exact_probabilities(spark):
    import datetime as dt

    from hybridbackend_spark.operators.timeseries import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    seq = ["view", "view", "cart", "view", "cart", "buy"]
    rows = [
        (1, t0 + dt.timedelta(minutes=i), i, s) for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, event_id: long, et: string")
    out = {(r["state"], r["next_state"]): (r["n_transitions"], r["p"])
           for r in transition_matrix(df, "user_id", "ts", "et", "event_id").collect()}
    # transitions: view->view, view->cart (x2), cart->view, cart->buy
    assert out[("view", "cart")] == (2, round(2 / 3, 6))
    assert out[("view", "view")] == (1, round(1 / 3, 6))
    assert out[("cart", "view")] == (1, 0.5)
    assert out[("cart", "buy")] == (1, 0.5)
    # no cross-user transition leakage
    df2 = df.unionAll(spark.createDataFrame(
        [(2, t0, 99, "buy")], "user_id: long, ts: timestamp, event_id: long, et: string"
    ))
    out2 = transition_matrix(df2, "user_id", "ts", "et", "event_id")
    assert sum(r["n_transitions"] for r in out2.collect()) == 5


def test_target_encode_loo_excludes_own_row(spark):
    from hybridbackend_spark.functions.feature import target_encode

    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 100.0)]
    df = spark.createDataFrame(rows, "id: long, cat: string, y: double")
    out = {r["id"]: r["cat_te"] for r in
           target_encode(df, "cat", "y", smoothing=2.0).collect()}
    prior = (10 + 20 + 30 + 100) / 4.0
    # row 1 in cat a: others sum 50, n-1=2 -> (50 + prior*2) / (2+2)
    assert abs(out[1] - (50 + prior * 2) / 4.0) < 1e-6
    # row 4 is the ONLY b row: denominator = 0 + m (pure prior pull)
    assert abs(out[4] - (0 + prior * 2) / 2.0) < 1e-6

    srv = {r["id"]: r["cat_te"] for r in
           target_encode(df, "cat", "y", smoothing=2.0, loo=False).collect()}
    assert abs(srv[1] - (60 + prior * 2) / 5.0) < 1e-6
    assert srv[1] == srv[2] == srv[3]  # serving mode: same enc per category


def test_sequence_pattern_match_counts(spark):
    import datetime as dt

    from hybridbackend_spark.operators.timeseries import sequence_pattern_match

    t0 = dt.datetime(2024, 1, 1)
    seq1 = ["click", "view", "cart", "purchase",   # match c[va]*p
            "click", "purchase",                   # match (zero quantifier)
            "view", "purchase"]                    # no click -> no match
    rows = [(1, t0 + dt.timedelta(minutes=i), i, s) for i, s in enumerate(seq1)]
    rows += [(2, t0, 100, "click"), (2, t0 + dt.timedelta(minutes=1), 101, "refund")]
    df = spark.createDataFrame(
        rows, "user_id: long, ts: timestamp, event_id: long, event_type: string"
    )
    out = {r["user_id"]: r for r in sequence_pattern_match(
        df, "user_id", "ts", "event_type",
        symbols={"view": "v", "click": "c", "cart": "a", "purchase": "p"},
        pattern="c[va]*p", tiebreak_col="event_id",
    ).collect()}
    assert out[1]["symbol_string"] == "cvapcpvp"
    assert out[1]["n_matches"] == 2
    assert out[2]["symbol_string"] == "c."   # unmapped state -> '.'
    assert out[2]["n_matches"] == 0


def test_corpus_spec_equals_hand_composition(spark):
    import json

    from pyspark.sql import functions as F

    from hybridbackend_spark.functions.spec import CorpusSpec
    from hybridbackend_spark.operators.corpus import hash_split
    from hybridbackend_spark.operators.dedup import exact_dedup
    from hybridbackend_spark.operators.text import quality_score, token_count

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again today"),  # dup
        (3, "short"),                                                    # too short
        (4, "a different but perfectly reasonable document for the corpus test"),
        (5, "1 2 3 4 5 6 7 8 9 10 11 12"),                               # digit junk
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    spec = CorpusSpec.read(json.dumps([
        {"op": "length_filter", "min_tokens": 4},
        {"op": "quality_filter", "min_score": 0.5},
        {"op": "exact_dedup"},
        {"op": "hash_split", "weights": {"train": 0.5, "val": 0.5}},
    ]))
    got = spec.apply(df)

    hand = df.filter(token_count(F.col("text")) >= 4)
    hand = hand.filter(quality_score(F.col("text")) >= 0.5)
    keep = exact_dedup(hand, "text", "doc_id").select("doc_id")
    hand = hand.join(keep, "doc_id", "left_semi")
    hand = hash_split(hand, F.col("doc_id"), weights={"train": 0.5, "val": 0.5})

    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, hand.collect()))
    assert a == b
    ids = {r[0] for r in a}
    assert 3 not in ids            # length filter
    assert len(ids & {1, 2}) == 1  # dedup kept one copy
    assert "split" in got.columns


def test_corpus_spec_unknown_stage_raises(spark):
    import pytest

    from hybridbackend_spark.functions.spec import CorpusSpec

    df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="unknown corpus stage"):
        CorpusSpec([{"op": "nope"}]).apply(df)


def test_rolling_distinct_hll_md5_within_error_of_exact(spark):
    """The md5-register HLL's raw estimate tracks the exact rolling
    distinct count within the m=256 error regime (~6.5% + small-range
    slack — raw_est carries no ln small-range correction by design)."""
    import random

    from hybridbackend_spark.functions.windows import (
        rolling_distinct_count,
        rolling_distinct_count_hll_md5,
    )

    rng = random.Random(29)
    rows = []
    for day in range(1, 29):
        for _ in range(rng.randint(100, 500)):
            rows.append(
                (f"2024-01-{day:02d} 12:00:00", rng.randint(0, 5000))
            )
    df = spark.createDataFrame(rows, "ts: string, user_id: long").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    exact = {
        str(r["day"]): r["active_ids"]
        for r in rolling_distinct_count(df, "ts", "user_id", 7).collect()
    }
    hll = {
        str(r["day"]): r
        for r in rolling_distinct_count_hll_md5(
            df, "ts", "user_id", 7
        ).collect()
    }
    assert set(exact) == set(hll)
    for day, n in exact.items():
        r = hll[day]
        # integer invariants
        assert r.n_regs + r.zeros == 256
        assert r.harmonic_num >= 256  # every register contributes >= 1
        # raw (uncorrected) estimate within the coarse-m error regime
        assert abs(r.raw_est - n) <= max(30, 0.25 * n), (
            f"{day}: exact {n} vs hll {r.raw_est}"
        )


def test_ewma_daily_revenue_math(spark, tmp_path):
    """Truncated alpha=1/2 EWMA: integer numerator/denominator follow
    the exact 2^(15-k) weights, gaps weight zero, denominator
    renormalizes over present days."""
    from hybridbackend_spark.queries import ewma_daily_revenue

    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    d = str(tmp_path)
    rows = [
        # three days with a gap: Jan 1 (v=100c), Jan 2 (200c), Jan 4 (400c)
        (1, "2024-01-01 10:00:00", 1, "a", 1.0),
        (2, "2024-01-02 10:00:00", 1, "a", 2.0),
        (3, "2024-01-04 10:00:00", 1, "a", 4.0),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [dt.datetime.fromisoformat(r[1]) for r in rows],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows]),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    got = {str(r.day): r for r in ewma_daily_revenue(spark, d).collect()}
    # Jan 2: num = 200*2^15 + 100*2^14, den = 2^15 + 2^14
    r2 = got["2024-01-02"]
    assert r2.ewma_num == 200 * (1 << 15) + 100 * (1 << 14)
    assert r2.ewma_den == (1 << 15) + (1 << 14)
    # Jan 4: lags 0 (Jan4), 2 (Jan2), 3 (Jan1) present; lag 1 absent
    r4 = got["2024-01-04"]
    assert r4.ewma_num == (400 * (1 << 15) + 200 * (1 << 13)
                           + 100 * (1 << 12))
    assert r4.ewma_den == (1 << 15) + (1 << 13) + (1 << 12)


def test_holt_linear_matches_python_recursion(spark):
    import datetime as dt

    from hybridbackend_spark.operators.timeseries import holt_linear

    vals = [3.0, 7.0, 2.0, 9.5, 4.25, 8.0]
    rows = [
        ("k1", dt.date(2024, 1, 1) + dt.timedelta(days=i), v)
        for i, v in enumerate(vals)
    ]
    # shuffled input + repartition: the fold must still run in ts order
    rows = [rows[i] for i in (3, 0, 5, 2, 4, 1)]
    df = spark.createDataFrame(rows, "k string, d date, v double").repartition(5)
    r = holt_linear(df, "k", "d", "v", horizon=7).collect()[0]
    l, b = vals[0], 0.0
    for v in vals[1:]:
        nl = 0.5 * v + 0.5 * (l + b)
        nb = 0.25 * (nl - l) + 0.75 * b
        l, b = nl, nb
    assert r.n_obs == 6
    assert r.level == round(l, 6)
    assert r.trend == round(b, 6)
    assert r.forecast == round(l + 7 * b, 6)


def test_holt_linear_single_observation(spark):
    import datetime as dt

    from hybridbackend_spark.operators.timeseries import holt_linear

    df = spark.createDataFrame(
        [("k", dt.date(2024, 1, 1), 5.0)], "k string, d date, v double"
    )
    r = holt_linear(df, "k", "d", "v").collect()[0]
    # l = v1, b = 0 -> flat forecast
    assert (r.n_obs, r.level, r.trend, r.forecast) == (1, 5.0, 0.0, 5.0)


def test_theil_sen_matches_python_median_of_slopes(spark):
    from hybridbackend_spark.operators.timeseries import theil_sen

    # y = 2x + noise with one gross outlier; robust slope stays ~2
    pts = [(0, 0.0), (1, 2.1), (2, 3.9), (3, 6.0), (4, 100.0), (5, 10.1)]
    rows = [("k", float(x), y) for x, y in pts]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = theil_sen(df, "k", "x", "y", max_obs=100).collect()[0]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
    )
    n = len(slopes)
    lo, hi = (n + 1) // 2, n // 2 + 1
    med = (slopes[lo - 1] + slopes[hi - 1]) / 2
    assert r.n_pairs == n
    assert r.slope == round(med, 6)
    assert 1.8 <= r.slope <= 2.2  # the outlier does not drag the trend


def test_theil_sen_max_obs_guard_fires(spark):
    import pytest

    from hybridbackend_spark.operators.timeseries import theil_sen

    df = spark.range(50).selectExpr(
        "'k' AS k", "CAST(id AS DOUBLE) AS x", "CAST(id AS DOUBLE) AS y"
    )
    with pytest.raises(ValueError, match="max_obs"):
        theil_sen(df, "k", "x", "y", max_obs=10)
    # and equal-x pairs are excluded, not divided by zero
    dup = spark.createDataFrame(
        [("k", 1.0, 5.0), ("k", 1.0, 9.0), ("k", 2.0, 6.0)],
        "k string, x double, y double",
    )
    out = theil_sen(dup, "k", "x", "y", max_obs=10).collect()[0]
    assert out.n_pairs == 2  # (1,5)-(2,6) and (1,9)-(2,6); not the x-tie


def test_mann_kendall_matches_python(spark):
    import math

    from hybridbackend_spark.operators.timeseries import mann_kendall

    ys = [3.0, 5.0, 4.0, 7.0, 7.0, 9.0, 8.0, 12.0]
    rows = [("k", float(i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    r = mann_kendall(df, "k", "x", "y", max_obs=100).collect()[0]
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tc = sum(t * (t - 1) * (2 * t + 5) for t in Counter(ys).values())
    var = (n * (n - 1) * (2 * n + 5) - tc) / 18.0
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var)
    assert (r.n_obs, r.s_stat) == (n, s)
    assert r.var_s == round(var, 6)
    assert r.z == round(z, 6)
    assert r.z > 1.96  # the planted upward trend is significant


def test_mann_kendall_degenerate_cases(spark):
    from hybridbackend_spark.operators.timeseries import mann_kendall

    # all tied -> variance 0 -> z NULL; s = 0
    tied = spark.createDataFrame(
        [("k", float(i), 5.0) for i in range(4)], "k string, x double, y double"
    )
    r = mann_kendall(tied, "k", "x", "y").collect()[0]
    assert (r.s_stat, r.var_s, r.z) == (0, 0.0, None)
    # single observation -> no pairs
    one = spark.createDataFrame([("k", 1.0, 2.0)], "k string, x double, y double")
    r1 = mann_kendall(one, "k", "x", "y").collect()[0]
    assert (r1.n_obs, r1.s_stat, r1.z) == (1, 0, None)


def test_mann_kendall_all_x_tied_z_null_not_zero(spark):
    from hybridbackend_spark.operators.timeseries import mann_kendall

    # all x equal, distinct y: no orderable pairs -> no test ran. With
    # the full two-sided tie correction the x-tie term cancels the
    # whole 1/18 numerator, so Var(S) itself is 0 — consistent with
    # "zero comparable pairs".
    df = spark.createDataFrame(
        [("k", 1.0, 3.0), ("k", 1.0, 5.0), ("k", 1.0, 7.0)],
        "k string, x double, y double",
    )
    r = mann_kendall(df, "k", "x", "y").collect()[0]
    assert r.s_stat == 0 and r.var_s == 0.0
    assert r.z is None  # NOT 0.0 — "no trend test possible"


def _mk_reference(pairs):
    """Independent textbook Mann-Kendall with the FULL Kendall tie
    correction (ties in x AND y + cross terms) — pure Python."""
    import math
    from collections import Counter

    n = len(pairs)
    s = 0
    for i in range(n):
        for j in range(n):
            if pairs[i][0] < pairs[j][0]:
                d = pairs[j][1] - pairs[i][1]
                s += 1 if d > 0 else -1 if d < 0 else 0
    ty = Counter(y for _, y in pairs).values()
    tx = Counter(x for x, _ in pairs).values()
    t3 = sum(t * (t - 1) * (2 * t + 5) for t in ty)
    u3 = sum(u * (u - 1) * (2 * u + 5) for u in tx)
    t2 = sum(t * (t - 1) * (t - 2) for t in ty)
    u2 = sum(u * (u - 1) * (u - 2) for u in tx)
    t1 = sum(t * (t - 1) for t in ty)
    u1 = sum(u * (u - 1) for u in tx)
    var = (n * (n - 1) * (2 * n + 5) - t3 - u3) / 18.0
    if n > 2:
        var += t2 * u2 / (9.0 * n * (n - 1) * (n - 2))
    if n > 1:
        var += t1 * u1 / (2.0 * n * (n - 1))
    if var <= 0:
        return s, var, None
    z = 0.0 if s == 0 else (s - (1 if s > 0 else -1)) / math.sqrt(var)
    return s, var, z


def test_mann_kendall_x_ties_full_correction(spark):
    """Ties in BOTH x and y: z must match the full Kendall variance
    (cross terms active), not the y-only correction."""
    from hybridbackend_spark.operators.timeseries import mann_kendall

    pairs = [
        (1.0, 3.0), (1.0, 5.0), (2.0, 5.0), (2.0, 4.0),
        (3.0, 7.0), (3.0, 7.0), (4.0, 6.0), (5.0, 9.0), (5.0, 3.0),
    ]
    s, var, z = _mk_reference(pairs)
    # sanity: this fixture genuinely activates both cross terms
    assert var != round((len(pairs) * (len(pairs) - 1)
                         * (2 * len(pairs) + 5)) / 18.0, 6)
    df = spark.createDataFrame(
        [("k", x, y) for x, y in pairs], "k string, x double, y double"
    )
    r = mann_kendall(df, "k", "x", "y").collect()[0]
    assert r.s_stat == s
    assert r.var_s == round(var, 6)
    assert r.z == round(z, 6)


def test_kendall_tau_b_matches_python(spark):
    """tau-b vs an independent pure-Python computation with ties in
    both variables, plus perfect concordance/discordance and the
    constant-variable NULL."""
    from hybridbackend_spark.operators.timeseries import kendall_tau_b

    cases = {
        "mono": [(1.0, 2.0), (2.0, 5.0), (3.0, 9.0), (4.0, 9.5)],
        "anti": [(1.0, 9.0), (2.0, 5.0), (3.0, 1.0)],
        "ties": [(1.0, 3.0), (1.0, 5.0), (2.0, 5.0), (3.0, 4.0),
                 (3.0, 7.0), (4.0, 4.0)],
        "const": [(1.0, 7.0), (2.0, 7.0), (3.0, 7.0)],
    }
    rows = [(g, x, y) for g, ps in cases.items() for x, y in ps]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in kendall_tau_b(df, "g", "x", "y").collect()}

    def ref(pairs):
        import math
        from collections import Counter

        n = len(pairs)
        s = 0
        for i in range(n):
            for j in range(n):
                if pairs[i][0] < pairs[j][0]:
                    d = pairs[j][1] - pairs[i][1]
                    s += 1 if d > 0 else -1 if d < 0 else 0
        t2y = sum(t * (t - 1) for t in Counter(y for _, y in pairs).values())
        t2x = sum(u * (u - 1) for u in Counter(x for x, _ in pairs).values())
        dy, dx = n * (n - 1) - t2y, n * (n - 1) - t2x
        if dy <= 0 or dx <= 0:
            return s, None
        return s, 2.0 * s / math.sqrt(float(dy) * dx)

    assert got["mono"].tau_b == 1.0
    assert got["anti"].tau_b == -1.0
    assert got["const"].tau_b is None
    for g, ps in cases.items():
        s, tau = ref(ps)
        assert got[g].s_stat == s, g
        if tau is None:
            assert got[g].tau_b is None, g
        else:
            assert got[g].tau_b == round(tau, 6), g


def test_timeseries_null_rows_excluded(spark):
    """NULL x/y rows must not bias n, tie sums, or the median rank
    (round-7 advisor: groupBy treats NULL as a tie group and Spark
    sorts NULLs first, so unfiltered NULLs silently shift tau_b's
    denominator and theil_sen's positional median)."""
    from hybridbackend_spark.operators.timeseries import (
        kendall_tau_b,
        mann_kendall,
        theil_sen,
    )

    clean = [("k", 0.0, 1.0), ("k", 1.0, 3.0), ("k", 2.0, 2.0),
             ("k", 3.0, 5.0)]
    dirty = clean + [("k", None, 9.0), ("k", 4.0, None), ("k", None, None)]
    schema = "k string, x double, y double"
    dfc = spark.createDataFrame(clean, schema)
    dfd = spark.createDataFrame(dirty, schema)
    for op in (kendall_tau_b, mann_kendall, theil_sen):
        rc = op(dfc, "k", "x", "y").collect()
        rd = op(dfd, "k", "x", "y").collect()
        assert rc == rd, f"{op.__name__} result changed by NULL rows"
    assert kendall_tau_b(dfd, "k", "x", "y").collect()[0].n_obs == 4


def test_xy_tie_stats_one_pass_matches_bruteforce(spark):
    """The folded tagged-explode tie pass must equal per-axis brute
    force counts (the round-7 fold cannot change any tie polynomial)."""
    from collections import Counter

    from hybridbackend_spark.operators.timeseries import _xy_tie_stats

    pts = [("a", 1.0, 1.0), ("a", 1.0, 2.0), ("a", 2.0, 2.0),
           ("a", 2.0, 2.0), ("a", 3.0, 1.0),
           ("b", 5.0, 5.0), ("b", 5.0, 5.0)]
    df = spark.createDataFrame(pts, "_k string, _x double, _y double")
    got = {r._k: r for r in _xy_tie_stats(df, cubic=True).collect()}
    for key in ("a", "b"):
        xs = Counter(x for k, x, _ in pts if k == key).values()
        ys = Counter(y for k, _, y in pts if k == key).values()
        r = got[key]
        assert r._n == sum(xs)
        assert r._u1 == sum(t * (t - 1) for t in xs)
        assert r._t1 == sum(t * (t - 1) for t in ys)
        assert r._u3 == sum(t * (t - 1) * (2 * t + 5) for t in xs)
        assert r._t3 == sum(t * (t - 1) * (2 * t + 5) for t in ys)
        assert r._u2 == sum(t * (t - 1) * (t - 2) for t in xs)
        assert r._t2 == sum(t * (t - 1) * (t - 2) for t in ys)


def test_bh_fdr_null_p_excluded(spark):
    """A NULL p-value must not take rank 1 / inflate m (round-7
    advisor): results over a battery with NULLs equal the battery
    without them."""
    from hybridbackend_spark.operators.analytics import bh_fdr

    clean = [("h1", 0.001), ("h2", 0.02), ("h3", 0.4), ("h4", 0.9)]
    dirty = clean + [("hx", None), ("hy", None)]
    schema = "h string, p double"
    rc = sorted(bh_fdr(spark.createDataFrame(clean, schema), "h", "p")
                .collect())
    rd = sorted(bh_fdr(spark.createDataFrame(dirty, schema), "h", "p")
                .collect())
    assert rc == rd
    assert all(r.m == 4 for r in rd)


def test_corpus_spec_curation_stages_equal_hand_composition(spark, sf_dir):
    """Round-12 stages (dsir_select / decontaminate / token_budget)
    resolve to the exact hand-written operator composition, including
    the budget stage's deterministic (md5-bucket, id) prefix fill."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hybridbackend_spark.functions.spec import CorpusSpec
    from hybridbackend_spark.operators.corpus import (
        decontaminate_spans,
        dsir_importance,
        hash_bucket,
        token_budget_mix,
    )
    from hybridbackend_spark.operators.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    spec = CorpusSpec([
        {"op": "dsir_select", "min_bits": -30,
         "target_expr": "source IN ('src0','src1','src2','src3','src4')"},
        {"op": "decontaminate", "eval": "ev", "n": 3, "max_frac": 0.2},
        {"op": "token_budget", "group": "source", "budget_frac_pct": 50,
         "max_epochs": 2},
    ])
    got = spec.apply(docs, tables={"ev": ev}).select("doc_id").collect()

    hand = docs
    sc = dsir_importance(
        hand,
        F.expr("source IN ('src0','src1','src2','src3','src4')"),
        "doc_id", "text", n_buckets=4096,
    )
    hand = hand.join(
        sc.filter(F.col("dsir_bits") >= -30).select("doc_id"),
        "doc_id", "left_semi",
    )
    rep = decontaminate_spans(hand, ev, "text", "doc_id", n=3)
    hand = hand.join(
        rep.filter(F.col("frac_covered") <= 0.2).select("doc_id"),
        "doc_id", "left_semi",
    )
    alloc = token_budget_mix(hand, "source", "text").select("source", "alloc")
    w = (
        Window.partitionBy("source")
        .orderBy(hash_bucket(F.col("doc_id"), 1_000_000, 0), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hand = (
        hand.withColumn("_c", F.sum(token_count(F.col("text")).cast("long")).over(w))
        .join(F.broadcast(alloc), "source")
        .filter(F.col("_c") <= F.col("alloc"))
    )
    ref = hand.select("doc_id").collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in ref)
    assert len(got) > 0


def test_corpus_spec_decontaminate_requires_table(spark):
    import pytest

    from hybridbackend_spark.functions.spec import CorpusSpec

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    with pytest.raises(ValueError, match="tables"):
        CorpusSpec([{"op": "decontaminate", "eval": "ev"}]).apply(df)
