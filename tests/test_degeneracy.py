"""Regression net for the degenerate-data ANSI-abort class.

`tools/degeneracy_audit.py` sweeps all 287 queries against
pathological tables (too slow for the suite); this file pins the
queries the first sweep actually caught, plus a canary, on the two
tiers that caught them — so the fixed abort classes can never
silently return. Spark 4.1 ANSI mode turns a degenerate division /
cast / mod into a job abort, and the oracle gate can't see it
(driver testdata is never degenerate).
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


@pytest.fixture(scope="module")
def degen_dirs(tmp_path_factory):
    from degeneracy_audit import _degenerate_copy

    dirs = {}
    for tier in ("constant", "empty", "nulls"):
        d = str(tmp_path_factory.mktemp(f"degen_{tier}"))
        _degenerate_copy(d, tier)
        dirs[tier] = d
    return dirs


def _queries():
    from hybridbackend_spark.queries import get_queries

    return get_queries()


# (query, tier) pairs the first audit sweep caught as engine aborts,
# plus a canary; each must now complete (possibly with 0 rows)
FIXED = [
    ("neyman_sample_orders", "constant"),   # zero-variance weight total
    ("fuzzy_join_customers", "constant"),   # mod by length('') == 0
    ("kmv_overlap_docs", "constant"),       # CAST('' AS INT) abort
    ("metric_auc", "constant"),             # single-class /P /N
    ("metric_auc_pr", "empty"),             # float(NULL) totals
    ("metric_auc_pr", "constant"),
    ("covariance_embeddings", "constant"),  # all-zero vectors
    ("q1_pricing_summary", "constant"),     # canary
    ("q1_pricing_summary", "empty"),
    # nulls tier (round-9 second sweep): NULL embeddings / NULL ts
    ("cosine_topk_lsh_docs", "nulls"),      # NULL vec -> NULL LSH key
    ("kcenter_select_embeddings", "nulls"),  # list(None) center crash
    ("covariance_embeddings", "nulls"),
    ("stream_sessions_stateful", "nulls"),  # NaT -> negative timeout
    ("stream_anomaly_flags", "nulls"),      # NaT -> negative TTL
]


@pytest.mark.parametrize("name,tier", FIXED)
def test_fixed_degenerate_abort(spark, degen_dirs, name, tier):
    n = _queries()[name](spark, degen_dirs[tier]).count()
    assert n >= 0


def test_covariance_ignores_null_vector_rows(spark):
    """A NULL-vector row must not inflate n: before the round-9 fix it
    contributed nothing to the sums but still entered the (n-1)
    denominator, silently shrinking every covariance."""
    from hybridbackend_spark.operators.decomp import covariance_matrix

    clean = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 5.0],), ([5.0, 9.0],)],
        "vec array<double>",
    )
    with_null = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0, 5.0],), ([5.0, 9.0],), (None,)],
        "vec array<double>",
    )
    a = {(r.i, r.j): r.cov for r in covariance_matrix(clean, "vec", 2).collect()}
    b = {(r.i, r.j): r.cov for r in
         covariance_matrix(with_null, "vec", 2).collect()}
    assert a == b and a[(0, 0)] == 4.0  # var([1,3,5]) sample = 4


def test_kmeans_and_kcenter_skip_null_vectors(spark):
    """NULL vectors neither seed nor move centroids; an all-NULL input
    fails the seeding guard with the designed message (previously:
    driver-side list(None) TypeError)."""
    from hybridbackend_spark.operators.similarity import (
        kcenter_select,
        kmeans_train,
    )

    mixed = spark.createDataFrame(
        [(1, None), (2, [0.0, 0.0]), (3, [4.0, 0.0])],
        "id long, vec array<double>",
    )
    cents = kmeans_train(mixed, "vec", k=2, iters=1, id_col="id")
    assert cents == [[0.0, 0.0], [4.0, 0.0]]
    assert kcenter_select(mixed, "vec", "id", k=2) == [2, 3]
    all_null = spark.createDataFrame(
        [(1, None)], "id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="need 2 init centroids, got 0"):
        kmeans_train(all_null, "vec", k=2, iters=1, id_col="id")
    assert kcenter_select(all_null, "vec", "id", k=2) == []


def test_designed_raise_still_fires(spark, degen_dirs):
    """The audit's 'designed raise' classification is real behavior:
    PCA's power iteration refuses an all-zero covariance with its own
    message rather than silently emitting garbage."""
    with pytest.raises(Exception, match="zero matvec"):
        _queries()["pca_project_embeddings"](
            spark, degen_dirs["constant"]
        ).count()


def test_exact_cents_guard_refuses_corrupt_scale():
    """The stateful ops' exact-cents conversion must fail LOUDLY (named
    guard) on corrupt-scale input: pandas' astype silently WRAPS finite
    overflow (1e300 -> int64 min, corrupting the running sum) and dies
    with an opaque IntCastingNaNError on inf — both found by the r10
    extremes audit via stream_running_counter."""
    import pandas as pd
    import pytest

    from hybridbackend_spark.streaming.stateful import _exact_cents

    # normal values round half-away-from-zero like SQL
    assert _exact_cents(pd.Series([1.23, -2.678, 0.0])).tolist() == [
        123, -268, 0
    ]
    for bad in (1e300, float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="exact-cents value outside"):
            _exact_cents(pd.Series([1.0, bad]))


def test_corrupt_scale_report_finds_planted_rows(spark):
    """The pre-scan validator (the extremes-tier lenient-mode decision:
    keep every cents consumer designed-loud, make corruption FINDABLE
    first) counts exactly the rows that would trip the exact-cents
    abort — NaN, +/-inf, and finite |x| >= 2^63/100 — over scalar AND
    array float columns, and reads clean on healthy data."""
    import pytest

    from hybridbackend_spark.sources.validate import (
        CENTS_BOUND,
        corrupt_scale_report,
    )

    rows = [
        (1, 1.23, [0.1, 0.2]),
        (2, float("nan"), [1.0, float("inf")]),
        (3, float("-inf"), [float("nan"), 2.0]),
        (4, 1e300, [0.0, -1e300]),
        (5, CENTS_BOUND, [0.5, 0.6]),       # boundary: >= bound trips
        (6, CENTS_BOUND * 0.99, [0.7]),     # just inside: clean
        (7, None, None),                    # NULLs never flag
    ]
    df = spark.createDataFrame(
        rows, "id long, v double, vec array<double>"
    )
    got = {
        r["column"]: r for r in corrupt_scale_report(df).collect()
    }
    assert set(got) == {"v", "vec"}
    v = got["v"]
    assert (v["n_rows"], v["n_nan"], v["n_inf"], v["n_out_of_range"]) == (
        7, 1, 1, 2
    )
    assert v["clean"] is False
    vec = got["vec"]
    assert (
        vec["n_nan"], vec["n_inf"], vec["n_out_of_range"]
    ) == (1, 1, 1)

    clean = spark.createDataFrame(
        [(1, 0.5), (2, -3.25)], "id long, v double"
    )
    out = corrupt_scale_report(clean).collect()
    assert len(out) == 1 and out[0]["clean"] is True

    # cols= filter + loud errors on misuse
    one = corrupt_scale_report(df, cols=["v"]).collect()
    assert len(one) == 1 and one[0]["column"] == "v"
    with pytest.raises(ValueError, match="not float-typed"):
        corrupt_scale_report(df, cols=["id"])
    with pytest.raises(ValueError, match="no float/double columns"):
        corrupt_scale_report(df.select("id"))
