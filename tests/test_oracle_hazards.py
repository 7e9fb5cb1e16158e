"""Oracle hazard gates (round-6, verdict item 7).

Two hazard classes the round-5 audit judged "acceptable by inspection"
are pinned here as mechanical pytest failures so they stay visible:

1. ``round(sum/avg(double), <=2)`` on an ORDER-DEPENDENT float
   aggregate: Spark and DuckDB may sum doubles in different orders, so
   the last ulp can differ and a coarse round() can flip the driver's
   value hash on a half-boundary. The exact-cents pattern
   (``sum(CAST(round(x*100) AS BIGINT))/100.0``) is the sanctioned
   alternative; integer-sum rounding is harmless. A static sweep over
   every registered oracle flags new violations at authoring time.

2. Session-timezone dependence: the driver passes its own SparkSession,
   so a non-UTC session zone must not shift hour/date buckets against
   the DuckDB oracles' naive timestamps. queries._pin_utc owns that
   invariant (once-per-session memo); this test simulates a FRESH
   non-UTC driver session (clears the memo, sets Asia/Tokyo) and
   hash-compares the five timezone-sensitive query families against
   their oracles — previously a manual verification per NOTES_r5.md.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import __spark_entry__ as entrymod  # noqa: E402
from check_oracle import table_hash  # noqa: E402

# ---------------------------------------------------------------------------
# hazard 1: coarse rounding of order-dependent float aggregates
# ---------------------------------------------------------------------------

# Integer-typed aggregate arguments: rounding an integer sum is identity,
# so these are exempt. Matched against the TEXT of the sum/avg argument.
_INTEGER_ARG_MARKERS = (
    "AS BIGINT",
    "AS INT",
    "::BIGINT",
    "::INT",
    "::HUGEINT",
)

# Columns whose double/int sum is EXACT and therefore order-independent:
# a sum of integral values is exact in IEEE double as long as every
# partial sum stays below 2^53 (partials of same-sign values are
# monotone, so total < 2^53 suffices — at 100 TB, sum(l_quantity) tops
# out around 5e13 << 9.0e15). Integrality itself is asserted by
# test_exact_sum_columns_are_integral below, so this allowlist cannot
# silently rot.
_EXACT_SUM_COLUMNS = {"l_quantity", "n_chars", "k.n_chars"}


def _split_top_level_args(s: str) -> list[str]:
    args, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        args.append("".join(cur))
    return args


def _balanced_span(s: str, start: int) -> str:
    """Return the contents of the parenthesized group opening at
    ``s[start] == '('``."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1 : i]
    raise ValueError("unbalanced parens")


def _coarse_float_agg_rounds(sql: str) -> list[str]:
    """Every ``round(sum|avg(<float expr>), p)`` with p <= 2 (or no p)
    whose aggregate argument is not integer-typed."""
    hits = []
    for m in re.finditer(r"\bround\s*\(", sql, re.I):
        inner = _balanced_span(sql, m.end() - 1)
        args = _split_top_level_args(inner)
        if len(args) > 2:
            continue
        precision = 0
        if len(args) == 2:
            p = args[1].strip()
            if not p.isdigit():
                continue
            precision = int(p)
        if precision > 2:
            continue
        first = args[0].strip()
        agg = re.match(r"(sum|avg)\s*\(", first, re.I)
        if not agg:
            continue
        agg_arg = _balanced_span(first, agg.end() - 1)
        arg_upper = agg_arg.upper()
        if any(mk in arg_upper for mk in _INTEGER_ARG_MARKERS):
            continue
        if agg_arg.strip() in _EXACT_SUM_COLUMNS:
            continue
        hits.append(f"round({first[:80]}..., {precision})")
    return hits


def test_exact_sum_columns_are_integral():
    """The _EXACT_SUM_COLUMNS allowlist rests on the columns being
    integral-valued; pin that against the data so the exemption fails
    loudly if the generator ever changes."""
    import duckdb

    con = duckdb.connect()
    try:
        (bad,) = con.sql(
            f"SELECT count(*) FROM '{SF_DIR}/lineitem.parquet' "
            "WHERE l_quantity != floor(l_quantity)"
        ).fetchone()
        assert bad == 0
        (t,) = [
            str(ty)
            for c, ty in zip(
                con.sql(f"DESCRIBE SELECT n_chars FROM "
                        f"'{SF_DIR}/documents.parquet'").fetchall(),
                con.sql(f"SELECT n_chars FROM "
                        f"'{SF_DIR}/documents.parquet' LIMIT 0").types,
            )
        ]
        assert "INT" in t.upper()
    finally:
        con.close()


def test_no_coarse_rounding_of_order_dependent_float_aggregates():
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        hits = _coarse_float_agg_rounds(sql)
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "Oracles rounding an order-dependent sum/avg(double) at <= 2 dp "
        "(use the exact-cents integer pattern instead — see queries.py "
        f"docstring): {offenders}"
    )


def test_hazard_scanner_detects_known_bad_patterns():
    """The sweep above only means anything if the scanner actually
    fires on the forbidden shapes and stays quiet on the sanctioned
    ones."""
    bad = "SELECT round(sum(l_extendedprice), 2) AS s FROM lineitem"
    assert _coarse_float_agg_rounds(bad)
    bad0 = "SELECT round(avg(value)) AS s FROM events"
    assert _coarse_float_agg_rounds(bad0)
    # sanctioned: exact-cents integer sum, fine-grained rounding,
    # rounding a non-aggregate
    ok_cents = (
        "SELECT sum(CAST(round(x * 100) AS BIGINT)) / 100.0 AS s FROM t"
    )
    assert not _coarse_float_agg_rounds(ok_cents)
    ok_fine = "SELECT round(avg(l_discount), 4) AS s FROM lineitem"
    assert not _coarse_float_agg_rounds(ok_fine)
    ok_scalar = "SELECT round(value, 2) AS s FROM events"
    assert not _coarse_float_agg_rounds(ok_scalar)


# ---------------------------------------------------------------------------
# hazard 2: session-timezone independence of the query surface
# ---------------------------------------------------------------------------

TZ_SENSITIVE = [
    "chisq_events",          # hour-of-day buckets
    "q12_shipmode_priority",  # date comparisons on timestamps
    "seasonal_dow_events",   # day-of-week buckets
    "resample_events_hourly",  # hourly resample
    "order_date_gaps",       # date arithmetic
]

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_non_utc_session_matches_oracle(spark, name):
    import duckdb

    from hybridbackend_spark import queries as qmod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert name in qs and name in oracles
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    # simulate a FRESH driver session whose zone is Asia/Tokyo: clear the
    # once-per-session memo so the surface must re-pin on first use
    qmod._UTC_PINNED.discard(spark)
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try:
        sdf = qs[name](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        qmod._UTC_PINNED.discard(spark)
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
        res = con.sql(oracles[name])
        ocols = res.columns
        orows = [tuple(r) for r in res.fetchall()]
    finally:
        con.close()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert table_hash(srows, scols) == table_hash(orows, ocols)
