"""Pure-Python tests for tools/bench_guard.py's normalization logic —
the scan-drift handling (round 9) has to be right for every future
round's history table, so its arithmetic is pinned here. No Spark."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import bench_guard as bg  # noqa: E402


def _row(round_no, queries, unit_post, unit_pre=None, spread=None):
    r = {
        "round": round_no,
        "queries": queries,
        "scans_rows_per_sec": {"scan_int64_cols": unit_post},
    }
    if unit_pre is not None:
        r["scans_rows_per_sec_pre"] = {"scan_int64_cols": unit_pre}
    if spread is not None:
        r["queries_spread"] = spread
    return r


class TestEffUnit:
    def test_post_only_artifact_falls_back(self):
        assert bg._eff_unit(_row(8, {}, 8.0e6)) == 8.0e6

    def test_pre_post_geometric_mean(self):
        # r9's real shape: pre 4.11M, post 12.28M -> geomean ~7.10M
        u = bg._eff_unit(_row(9, {}, 12.28e6, unit_pre=4.11e6))
        assert abs(u - (12.28e6 * 4.11e6) ** 0.5) < 1.0

    def test_missing_unit_is_none(self):
        assert bg._eff_unit({"queries": {}}) is None


class TestQueryMoves:
    def test_uniform_unit_error_flags_nothing(self):
        # Every query "moves" -30% by the same factor: that is the
        # unit's residual error, and the median-relative check must
        # report zero per-query flags (only the residual header line).
        prev = _row(8, {"a": 1.0, "b": 2.0, "c": 0.5}, 6.0e6)
        cur = _row(9, {"a": 0.7, "b": 1.4, "c": 0.35}, 6.0e6)
        flags = bg._query_moves([prev, cur])
        assert len(flags) == 1  # residual header only
        assert "median move" in flags[0]

    def test_real_outlier_is_flagged(self):
        # b regresses 2x while a and c hold: b must be flagged, a/c not.
        prev = _row(8, {"a": 1.0, "b": 1.0, "c": 1.0}, 6.0e6)
        cur = _row(9, {"a": 1.0, "b": 2.0, "c": 1.0}, 6.0e6)
        flags = bg._query_moves([prev, cur])
        named = [f for f in flags if f.startswith("`")]
        assert len(named) == 1 and named[0].startswith("`b`")

    def test_unit_error_plus_outlier(self):
        # A 0.7x uniform unit error AND one true 2x regression: only
        # the regression deviates from the median.
        prev = _row(8, {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0}, 6.0e6)
        cur = _row(
            9, {"a": 0.7, "b": 1.4, "c": 0.7, "d": 0.7}, 6.0e6
        )
        flags = bg._query_moves([prev, cur])
        named = [f for f in flags if f.startswith("`")]
        assert len(named) == 1 and named[0].startswith("`b`")

    def test_spread_annotation_present(self):
        prev = _row(8, {"a": 1.0, "b": 1.0, "c": 1.0}, 6.0e6)
        cur = _row(
            9,
            {"a": 1.0, "b": 2.0, "c": 1.0},
            6.0e6,
            spread={"b": {"min": 2.0, "med": 2.1, "max": 2.2}},
        )
        flags = bg._query_moves([prev, cur])
        named = [f for f in flags if f.startswith("`b`")]
        assert named and "spread min..max 2.0..2.2s" in named[0]

    def test_single_round_no_flags(self):
        assert bg._query_moves([_row(9, {"a": 1.0}, 6.0e6)]) == []


class TestQueryMovesSmallSample:
    def test_two_query_regression_attributed_correctly(self):
        # r9 advisor: with only two comparable queries, the sorted-median
        # residual IS one of the moves — a real 2x regression would
        # become the "residual" and the STABLE query would flag as a
        # -100pp improvement (inverted attribution). Below 3 samples the
        # check must fall back to ABSOLUTE moves: the regression flags,
        # the stable query does not.
        prev = _row(8, {"a": 1.0, "b": 1.0}, 6.0e6)
        cur = _row(9, {"a": 1.0, "b": 2.0}, 6.0e6)
        flags = bg._query_moves([prev, cur])
        named = [f for f in flags if f.startswith("`")]
        assert len(named) == 1 and named[0].startswith("`b`"), flags
        assert "too few for a median residual" in flags[0]
