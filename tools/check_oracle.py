"""Local replica of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# DuckDB types that pandas cannot hold as int64 — the driver's pandas
# canonicalization coerces them to float64, so an uncast sum(int) oracle
# column renders "15000.0" against Spark's "15000" and flips the hash
# even when values agree. Replicate that coercion locally so the gate
# sees exactly what the driver sees.
FLOAT_COERCED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "DECIMAL")


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # TYPE-FAITHFUL float rendering: a float-typed integral value must
        # keep its ".0" (pandas/driver renders float64 15000 as "15000.0";
        # the old "%.9g" collapsed it to "15000" and masked type skew).
        s = f"{v:.9g}"
        if "." not in s and "e" not in s and "inf" not in s:
            s += ".0"
        return s
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "|".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from hybridbackend_spark.session import get_session

    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"spark: {e}"[:500]}
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)  [{time.time()-t0:.1f}s]")
            report[name] = {"rows_only": True, "spark_rows": len(srows),
                            "err": None}
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            otypes = [str(t) for t in res.types]
            orows = [tuple(r) for r in res.fetchall()]
            # Replicate the driver's pandas coercion: HUGEINT/DECIMAL etc.
            # output columns arrive float64 driver-side; coerce here too so
            # a type-skewed oracle fails locally, not in the round artifact.
            coerce = [
                i for i, t in enumerate(otypes)
                if any(t.startswith(p) for p in FLOAT_COERCED_DUCK_TYPES)
            ]
            if coerce:
                cset = set(coerce)
                orows = [
                    tuple(
                        float(v) if i in cset and v is not None else v
                        for i, v in enumerate(r)
                    )
                    for r in orows
                ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "err": f"duckdb: {e}"[:500]}
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
        ok_hash = sh == oh
        report[name] = {
            "rows_match": ok_count, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(srows),
            "oracle_rows": len(orows), "err": None,
        }
        status = "OK  " if (ok_cols and ok_count and ok_hash) else "FAIL"
        print(
            f"{status}  {name}: rows {len(srows)}/{len(orows)} "
            f"cols={'=' if ok_cols else f'{scols} vs {ocols}'} "
            f"hash={'=' if ok_hash else f'{sh} vs {oh}'}  [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_count and not ok_hash:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("|".join(norm_value(r[i]) for i in order) for r in srows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = sorted("|".join(norm_value(r[i]) for i in oorder) for r in orows)
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                for a, b in diffs:
                    print(f"        spark: {a}\n        duck : {b}")
    # Full (unfiltered) runs leave a committable snapshot so the claim
    # "the whole registry is green" is evidenced by an artifact, not notes.
    if not only:
        import json
        import os
        import subprocess

        # _meta stamps the tree this gate ran on (round-10 verdict item
        # 6): per-query implementation fingerprints (source segment +
        # helper segments + imported module contents — plan_window's
        # staleness cone) let the rotation scheduler count a green row
        # here as "locally re-proven" for exactly as long as the code
        # stays byte-identical, plus HEAD for human audit.
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from plan_window import current_fingerprints

        head = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        out = {
            "_meta": {
                "head": head,
                "fingerprints": current_fingerprints(),
            },
            **report,
        }
        with open(f"{REPO}/CORRECTNESS_local.json", "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote CORRECTNESS_local.json ({len(report)} entries)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
