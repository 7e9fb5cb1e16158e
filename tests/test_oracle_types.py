"""Oracle result-type gate.

The driver compares Spark vs DuckDB through pandas. DuckDB types that
pandas cannot represent as int64 — HUGEINT (the default type of
``sum(INTEGER/BIGINT)``), UBIGINT, UHUGEINT, and DECIMAL — are coerced
to float64, so an uncast integer aggregate renders ``15000.0`` against
Spark's ``15000`` and flips the driver's value hash even when every
value agrees. This burned six CORRECTNESS_r04 rows (all six red rows
shared this one mechanism) and left nine more latent.

This test runs EVERY registered oracle through DuckDB at sf0.001 and
asserts no output column carries one of the coerced types, turning the
whole defect class into a local pytest failure at authoring time.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.001"

# Types pandas coerces to float64 (or object) — forbidden in oracle output.
FORBIDDEN_PREFIXES = ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def test_no_float_coerced_oracle_columns(con):
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        bad = {
            c: str(t)
            for c, t in zip(rel.columns, rel.types)
            if any(str(t).startswith(p) for p in FORBIDDEN_PREFIXES)
        }
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "Oracle output columns with pandas-float-coerced DuckDB types "
        "(CAST the aggregate to BIGINT in the oracle SQL): "
        f"{offenders}"
    )
