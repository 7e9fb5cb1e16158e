"""Compute the next round's driver window: every registered query that
has NO green row in any CORRECTNESS_r*.json yet, in registration order
— the set `_DRIVER_WINDOW_FIRST` (queries.py) should front-load so the
driver-verified union keeps closing. Prints the suggested list plus
union coverage stats.

Usage: python tools/plan_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from hybridbackend_spark.queries import QUERIES

    verified: set[str] = set()
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        with open(path) as f:
            report = json.load(f)
        for name, row in report.items():
            if not isinstance(row, dict):
                continue
            # a full green row: rows+schema+hash all matched (hash_match
            # is None for rows-only checks — those don't count)
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                verified.add(name)
    registered = list(QUERIES)
    never = [n for n in registered if n not in verified]
    print(
        f"registered={len(registered)} driver-verified={len(verified & set(registered))} "
        f"never-verified={len(never)}"
    )
    print("suggested _DRIVER_WINDOW_FIRST head (never-verified, registration order):")
    for n in never:
        print(f'    "{n}",')


if __name__ == "__main__":
    main()
