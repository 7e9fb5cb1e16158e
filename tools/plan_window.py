"""Compute the next round's driver window.

Two signals, combined (round-8 verdict item 2 — re-verification rotation
against engine/source drift):

1. NEVER-VERIFIED: registered queries with no green row in any
   CORRECTNESS_r*.json (these always go first — the union must close).
2. STALE-AND-CHANGED: queries whose last green row is OLD and whose
   implementation has CHANGED since that row was recorded. "Changed" is
   mechanical, not guessed: the query function's own source segment
   (decorators + body) is diffed against the queries.py revision at the
   commit that recorded its last green artifact; one level of
   queries.py-local helper functions referenced by the body is included;
   and every `from .operators/functions/sources/streaming ...` module the
   body imports is checked against `git diff --name-only <artifact
   commit>..HEAD`. A query whose code (direct or via those deps) is
   byte-identical since its last green row does not need re-proving; one
   whose code moved does, oldest round first.

Prints the suggested `_DRIVER_WINDOW_FIRST` head: never-verified (in
registration order), then up to --stale N (default 40) stale-and-changed
queries, oldest last-green round first.

Usage: python tools/plan_window.py [--stale N] [--new name ...]
  --new: names to treat as this round's additions (forced to the front,
         before the never-verified set; normally the additions have no
         artifact row yet so they land in never-verified anyway).
"""

from __future__ import annotations

import argparse
import ast
import glob
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES_PATH = "hybridbackend_spark/queries.py"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], capture_output=True, text=True, check=True
    ).stdout


def _green(row) -> bool:
    return bool(
        isinstance(row, dict)
        and row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def last_green_rounds() -> dict[str, tuple[int, str]]:
    """name -> (round number of LAST green row, artifact path)."""
    out: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(f"{REPO}/CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            report = json.load(f)
        for name, row in report.items():
            if _green(row):
                prev = out.get(name)
                if prev is None or rnd > prev[0]:
                    out[name] = (rnd, path)
    return out


def _top_level_defs(tree: ast.Module, src: str) -> dict[str, str]:
    """name -> source segment (incl. decorators) of every top-level def."""
    lines = src.splitlines(keepends=True)
    out: dict[str, str] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            start = min(
                [node.lineno] + [d.lineno for d in node.decorator_list]
            )
            out[node.name] = "".join(lines[start - 1 : node.end_lineno])
    return out


def _body_deps(seg: str, all_defs: set[str]) -> tuple[set[str], set[str]]:
    """(queries.py-local helper names referenced, package modules imported)
    for one function's source segment."""
    helpers: set[str] = set()
    modules: set[str] = set()
    try:
        tree = ast.parse(seg)
    except SyntaxError:
        return helpers, modules
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and node.id in all_defs:
            helpers.add(node.id)
        if isinstance(node, ast.ImportFrom) and node.level >= 1:
            # `from .operators.analytics import x` inside queries.py
            mod = node.module or ""
            rel = mod.replace(".", "/")
            modules.add(f"hybridbackend_spark/{rel}.py")
            modules.add(f"hybridbackend_spark/{rel}/__init__.py")
    return helpers, modules


def current_fingerprints() -> dict[str, str]:
    """name -> sha256 fingerprint (16 hex chars) of each registered
    query's CURRENT implementation: its queries.py source segment, the
    segments of the queries.py-local helpers it references, and the file
    content of every package module its body imports — the same one-level
    dependency cone :func:`stale_changed` diffs. Two equal fingerprints
    mean the implementation is byte-identical, which is the unit of
    "unchanged since verification".

    check_oracle.py stamps these into CORRECTNESS_local.json's ``_meta``
    at run time (round-10 verdict item 6); :func:`main` compares them to
    the current tree to count a green local row as "locally re-proven
    since the driver's last green row". Scope (round-11 advisor): the
    cone is ONE level deep — a change in a helper-of-a-helper, or in a
    module imported by an imported module, does NOT move the
    fingerprint, so "re-proven" means "the one-level cone is
    byte-identical to what the local gate ran", not a transitive
    guarantee. Acceptable because the signal only orders the rotation
    (stale queries re-enter the driver window either way); the hard
    evidence remains the driver's own hash rows. Whether the artifact
    is committed yet doesn't change its evidence.
    """
    from hybridbackend_spark.queries import QUERIES

    cur_src = open(os.path.join(REPO, QUERIES_PATH)).read()
    cur_defs = _top_level_defs(ast.parse(cur_src), cur_src)
    all_def_names = set(cur_defs)
    file_sha: dict[str, str] = {}

    def fsha(rel: str) -> str:
        if rel not in file_sha:
            p = os.path.join(REPO, rel)
            file_sha[rel] = (
                hashlib.sha256(open(p, "rb").read()).hexdigest()
                if os.path.exists(p)
                else ""
            )
        return file_sha[rel]

    out: dict[str, str] = {}
    for name, fn in QUERIES.items():
        seg = cur_defs.get(fn.__name__)
        if seg is None:
            continue
        helpers, modules = _body_deps(seg, all_def_names)
        h = hashlib.sha256(seg.encode())
        for hn in sorted(helpers):
            h.update((cur_defs.get(hn) or "").encode())
        for m in sorted(modules):
            h.update(m.encode())
            h.update(fsha(m).encode())
        out[name] = h.hexdigest()[:16]
    return out


def local_reproven(path: str | None = None) -> set[str]:
    """Names whose implementation is byte-identical to what the last
    full check_oracle.py run proved green: CORRECTNESS_local.json rows
    that are green AND whose recorded fingerprint matches the current
    tree's. Empty set if the artifact predates fingerprint stamping.
    ``path`` overrides the artifact location (tests)."""
    path = path or os.path.join(REPO, "CORRECTNESS_local.json")
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        report = json.load(f)
    meta = report.get("_meta") or {}
    fps = meta.get("fingerprints") or {}
    if not fps:
        return set()
    cur = current_fingerprints()
    return {
        name
        for name, row in report.items()
        if name != "_meta"
        and _green(row)
        and fps.get(name)
        and fps.get(name) == cur.get(name)
    }


def stale_changed(lg: dict[str, tuple[int, str]], registered: list[str],
                  fn_names: dict[str, str]) -> list[tuple[int, str]]:
    """[(last_green_round, name)] for verified queries whose function
    segment / helper segments / imported modules changed since the commit
    that recorded their last green artifact. Sorted oldest round first,
    registration order within a round."""
    cur_src = open(os.path.join(REPO, QUERIES_PATH)).read()
    cur_defs = _top_level_defs(ast.parse(cur_src), cur_src)
    all_def_names = set(cur_defs)

    # cache per artifact commit: (historical defs map, changed file set)
    per_commit: dict[str, tuple[dict[str, str], set[str]]] = {}

    def commit_state(artifact: str) -> tuple[dict[str, str], set[str]]:
        commit = _git(
            "log", "-1", "--format=%H", "--", os.path.basename(artifact)
        ).strip()
        if not commit and os.path.exists(artifact):
            # The artifact exists on disk but isn't committed yet (the
            # driver writes CORRECTNESS_r{N}.json before anyone commits
            # it). Its green rows were produced against a tree no older
            # than HEAD, so HEAD is the correct conservative baseline —
            # without this, every freshly-verified query is miscounted
            # as changed-since-green (round-9 verdict, "What's wrong" 4).
            commit = _git("rev-parse", "HEAD").strip()
        if not commit:
            return {}, set()
        if commit not in per_commit:
            try:
                old_src = _git("show", f"{commit}:{QUERIES_PATH}")
                old_defs = _top_level_defs(ast.parse(old_src), old_src)
            except Exception:
                old_defs = {}
            changed_files = set(
                _git("diff", "--name-only", f"{commit}..HEAD").splitlines()
            )
            per_commit[commit] = (old_defs, changed_files)
        return per_commit[commit]

    out: list[tuple[int, str]] = []
    order = {n: i for i, n in enumerate(registered)}
    for name, (rnd, artifact) in lg.items():
        if name not in order:
            continue
        fn = fn_names.get(name)
        seg = cur_defs.get(fn or "")
        if seg is None:
            continue
        old_defs, changed_files = commit_state(artifact)
        old_seg = old_defs.get(fn or "")
        changed = old_seg != seg
        if not changed:
            helpers, modules = _body_deps(seg, all_def_names)
            for h in helpers:
                if old_defs.get(h) != cur_defs.get(h):
                    changed = True
                    break
            if not changed and any(m in changed_files for m in modules):
                changed = True
        if changed:
            out.append((rnd, name))
    out.sort(key=lambda t: (t[0], order[t[1]]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stale", type=int, default=40)
    ap.add_argument("--new", nargs="*", default=[])
    args = ap.parse_args()

    from hybridbackend_spark.queries import QUERIES

    registered = list(QUERIES)
    fn_names = {n: fn.__name__ for n, fn in QUERIES.items()}
    lg = last_green_rounds()
    verified = set(lg) & set(registered)
    never = [n for n in registered if n not in verified]
    stale = stale_changed(lg, registered, fn_names)
    # local-gate currency (round-10 verdict item 6): the builder runs
    # the full 287-query oracle gate every round; when its artifact
    # carries per-query implementation fingerprints, a driver-stale
    # query whose fingerprint still matches the current tree has been
    # RE-PROVEN locally since the code changed. Driver windows remain
    # the hard signal — local re-proof only deprioritizes, never
    # removes, a query from rotation.
    reproven = local_reproven()
    stale_hard = [(r, n) for r, n in stale if n not in reproven]
    stale_soft = [(r, n) for r, n in stale if n in reproven]

    print(
        f"registered={len(registered)} driver-verified={len(verified)} "
        f"never-verified={len(never)} stale-and-changed={len(stale)}"
    )
    print(
        f"  of stale: locally re-proven on current tree "
        f"(CORRECTNESS_local fingerprint match) = {len(stale_soft)}, "
        f"needing any proof = {len(stale_hard)}"
    )
    head = list(args.new) + [n for n in never if n not in args.new]
    budget = max(0, 50 - len(head))
    ranked = stale_hard + stale_soft
    picked = [n for _, n in ranked if n not in head][
        : min(args.stale, budget)
    ]
    print("suggested _DRIVER_WINDOW_FIRST head "
          "(additions + never-verified + stalest-changed, "
          "locally-unproven first):")
    for n in head + picked:
        tag = ""
        if n in lg:
            lp = " local-green" if n in reproven else ""
            tag = f"  # changed since last green (r{lg[n][0]:02d}){lp}"
        print(f'    "{n}",{tag}')


if __name__ == "__main__":
    main()
