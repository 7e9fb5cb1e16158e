"""Cross-file schema validation CLI (reference ``hb.data.validate``,
``data/validate.py:40-75``): verify that every file in a dataset agrees on
column names, dtypes, and ragged ranks before a scan job is launched.

Usage::

    python -m hybridbackend_spark.sources.validate FILE [FILE ...]
    python -m hybridbackend_spark.sources.validate --glob '/data/part-*.parquet'

Exit code 0 = consistent, 1 = problems found (printed one per line).
Footer-only reads — no data is scanned, so validating thousands of files
is cheap and embarrassingly parallel (the reference does the same via
footer metadata)."""

from __future__ import annotations

import argparse
import glob as _glob
import sys

from ..schema import infer_fields, validate_files


def main(argv: list[str] | None = None) -> int:
    # a console script piped into `head` must die silently on SIGPIPE,
    # not traceback (POSIX CLI convention)
    try:
        import signal

        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (AttributeError, ValueError):
        pass
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("files", nargs="*", help="parquet/orc files")
    p.add_argument("--glob", help="glob pattern of files")
    p.add_argument(
        "--print-schema", action="store_true", help="print the resolved schema"
    )
    args = p.parse_args(argv)

    files = list(args.files)
    if args.glob:
        files += sorted(_glob.glob(args.glob))
    if not files:
        p.error("no files given")

    if args.print_schema:
        for f in infer_fields(files[0]):
            print(f"{f.name}: {f.dtype} ragged_rank={f.ragged_rank}")

    problems = validate_files(files)
    for prob in problems:
        print(prob)
    if not problems:
        print(f"OK: {len(files)} file(s) consistent")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
