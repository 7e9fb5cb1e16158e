"""Pins for the rotation scheduler's local-verification currency
(round-11): per-query implementation fingerprints stamped into
CORRECTNESS_local.json by check_oracle.py, consumed by
plan_window.local_reproven(). Pure-python — no Spark session."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def pw():
    import plan_window

    return plan_window


def test_current_fingerprints_cover_registry_and_are_stable(pw):
    from hybridbackend_spark.queries import QUERIES

    fp1 = pw.current_fingerprints()
    fp2 = pw.current_fingerprints()
    assert fp1 == fp2  # deterministic on an unchanged tree
    # every registered query whose function is a top-level def in
    # queries.py gets a fingerprint (that is all of them today)
    assert set(fp1) == set(QUERIES)
    # 16-hex-char digests, all distinct inputs hash somewhere
    assert all(len(v) == 16 for v in fp1.values())


def test_local_reproven_requires_green_and_fingerprint_match(
    pw, tmp_path
):
    fp = pw.current_fingerprints()
    names = sorted(fp)[:4]
    a, b, c, d = names
    art = {
        "_meta": {"head": "test", "fingerprints": {
            a: fp[a],
            b: "0" * 16,        # stale fingerprint -> not re-proven
            c: fp[c],
            # d: absent -> not re-proven
        }},
        a: {"rows_match": True, "schema_match": True, "hash_match": True},
        b: {"rows_match": True, "schema_match": True, "hash_match": True},
        # c green on rows/schema but hash FAILED -> not re-proven
        c: {"rows_match": True, "schema_match": True, "hash_match": False},
        d: {"rows_match": True, "schema_match": True, "hash_match": True},
    }
    p = tmp_path / "CORRECTNESS_local.json"
    p.write_text(json.dumps(art))
    assert pw.local_reproven(str(p)) == {a}


def test_local_reproven_empty_without_meta(pw, tmp_path):
    # pre-r11 artifact shape (no _meta): currency must be zero, loudly
    # absent rather than wrongly assumed
    p = tmp_path / "CORRECTNESS_local.json"
    p.write_text(json.dumps({
        "q": {"rows_match": True, "schema_match": True,
              "hash_match": True},
    }))
    assert pw.local_reproven(str(p)) == set()
    assert pw.local_reproven(str(tmp_path / "missing.json")) == set()


def test_committed_artifact_is_fingerprinted_and_consistent(pw):
    """The repo's committed CORRECTNESS_local.json carries _meta
    fingerprints (written by check_oracle.py since r11), and every
    name local_reproven() returns is a green row of that artifact."""
    path = os.path.join(REPO, "CORRECTNESS_local.json")
    with open(path) as f:
        art = json.load(f)
    assert "_meta" in art and art["_meta"].get("fingerprints")
    rp = pw.local_reproven()
    greens = {
        n for n, row in art.items()
        if n != "_meta" and isinstance(row, dict)
        and row.get("hash_match")
    }
    assert rp <= greens
