"""Degenerate-data audit: run every registered query against
pathological fixture tables and classify failures.

Spark 4.1 runs ANSI mode ON: any division whose denominator is 0 on
degenerate data (empty groups, constant columns, zero variance,
all-zero vectors, empty text) ABORTS the job instead of yielding NULL.
The oracle gate can never catch these — the driver's testdata is
non-degenerate by construction — so this audit generates the
degenerate shapes and executes them:

- tier ``empty``:    every table with the real schema and 0 rows
- tier ``constant``: 3 rows per table, every non-key column constant
                     (zeros / empty strings / zero vectors / one ts)
- tier ``single``:   1 row per table (same constant values) — the
                     /(n-1) sample-variance class, lag/lead-NULL
                     window paths, and single-vertex graphs
- tier ``nulls``:    3 rows per table, keys kept, every non-key value
                     column NULL — NULL propagation through casts,
                     windows, and driver-side collects (float(None))

A query PASSES if it returns (possibly zero rows) or raises one of its
own DOCUMENTED guards (USER_RAISED_EXCEPTION / ValueError with a
message). It FAILS the audit if the engine aborts with an ANSI class:
DIVIDE_BY_ZERO, CAST_INVALID_INPUT, CAST_OVERFLOW, ARITHMETIC_OVERFLOW,
NUMERIC_VALUE_OUT_OF_RANGE, ARRAY_INDEX..., etc.

Usage:
  python tools/degeneracy_audit.py [empty|constant] [query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"

ANSI_CLASSES = (
    "DIVIDE_BY_ZERO",
    "CAST_INVALID_INPUT",
    "CAST_OVERFLOW",
    "ARITHMETIC_OVERFLOW",
    "NUMERIC_VALUE_OUT_OF_RANGE",
    "INVALID_ARRAY_INDEX",
    "INVALID_INDEX_OF_ZERO",
    "INTERVAL_DIVIDED_BY_ZERO",
)

# raises that are the operator's own documented, intentional guards —
# a guard firing on degenerate input is correct behavior, not a bug
DESIGNED_RAISE_MARKERS = (
    "USER_RAISED_EXCEPTION",
    "under-covered",
    "negative weight",
    "fat bucket",
    "max_bucket",
    "requires at least",
    "must be",
    "need ",
    "no rows",
    "empty",
    "zero matvec",
    "degenerate",
)


def _degenerate_copy(out_dir: str, tier: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for fn in os.listdir(SRC):
        if not fn.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(SRC, fn))
        if tier == "empty":
            out = t.slice(0, 0)
        else:  # constant / single
            head = t.slice(0, 1 if tier == "single" else 3)
            cols = []
            for name in head.schema.names:
                col = head[name]
                typ = col.type
                n = len(head)
                is_key = name.endswith(("_id", "key")) or name == "vec_id"
                if tier == "nulls" and not is_key:
                    arr = pa.nulls(n, typ)
                elif pa.types.is_integer(typ):
                    # keys keep 3 distinct small values so joins/groups
                    # still form; "constant" stresses VALUE columns
                    if name.endswith(("_id", "key")) or name in ("vec_id",):
                        arr = pa.array(list(range(1, n + 1)), typ)
                    else:
                        arr = pa.array([0] * n, typ)
                elif pa.types.is_floating(typ):
                    arr = pa.array([0.0] * n, typ)
                elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
                    arr = pa.array([""] * n, typ)
                elif pa.types.is_timestamp(typ):
                    arr = pa.array([0] * n, pa.int64()).cast(typ)
                elif pa.types.is_date(typ):
                    arr = pa.array([0] * n, pa.int32()).cast(typ)
                elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
                    inner = typ.value_type
                    if pa.types.is_floating(inner):
                        # keep the source dimensionality: operators
                        # legitimately pin dim (hyperplane keys, PCA),
                        # and a wrong-dim fixture tests the guard, not
                        # the degenerate-VALUE path this audit is for
                        dims = [
                            len(col[i]) if col[i].is_valid else 0
                            for i in range(n)
                        ]
                        arr = pa.array([[0.0] * d for d in dims], typ)
                    else:
                        arr = pa.array([[]] * n, typ)
                elif pa.types.is_decimal(typ):
                    arr = pa.array([0] * n, pa.int64()).cast(typ)
                else:
                    arr = col.combine_chunks()
                cols.append(arr)
            out = pa.table(dict(zip(head.schema.names, cols)))
        pq.write_table(out, os.path.join(out_dir, fn))


def main() -> int:
    tier = sys.argv[1] if len(sys.argv) > 1 else "constant"
    only = set(sys.argv[2:])
    out_dir = os.path.join(
        tempfile.gettempdir(), f"hb_degen_{tier}"
    )
    _degenerate_copy(out_dir, tier)

    from hybridbackend_spark.queries import get_queries
    from hybridbackend_spark.session import get_session

    spark = get_session(
        f"degen_{tier}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    queries = get_queries()
    results = {"ok": [], "designed": [], "ansi": [], "other": []}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            n = fn(spark, out_dir).count()
            results["ok"].append((name, n))
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0] if str(e) else repr(e)
            full = str(e)
            if any(c in full for c in ANSI_CLASSES):
                results["ansi"].append((name, msg[:160]))
                print(f"ANSI-ABORT {name}: {msg[:160]}", flush=True)
            elif any(m in full for m in DESIGNED_RAISE_MARKERS):
                results["designed"].append((name, msg[:120]))
            else:
                results["other"].append((name, msg[:160]))
                print(f"OTHER-FAIL {name}: {msg[:160]}", flush=True)

    print(f"\n=== degeneracy audit tier={tier} ===")
    print(f"ok:       {len(results['ok'])}")
    print(f"designed: {len(results['designed'])}")
    for n, m in results["designed"]:
        print(f"  {n}: {m}")
    print(f"ANSI:     {len(results['ansi'])}")
    for n, m in results["ansi"]:
        print(f"  {n}: {m}")
    print(f"other:    {len(results['other'])}")
    for n, m in results["other"]:
        print(f"  {n}: {m}")
    return 1 if results["ansi"] else 0


if __name__ == "__main__":
    sys.exit(main())
