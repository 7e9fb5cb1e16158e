"""Regenerate the committed JPEG fixtures + pinned decoded-pixel hashes
used by tests/test_jpeg.py::test_fixture_jpegs_pinned_hashes.

Run from the repo root: python tools/make_jpeg_fixtures.py
The encoder lives in the test module (tests/test_jpeg.py) on purpose —
it is independent of the production decoder.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from hybridbackend_spark.operators.jpeg import decode_jpeg
from test_jpeg import encode_jpeg, encode_jpeg_progressive, fixture_recipes


def main() -> None:
    out_dir = os.path.join(REPO, "fixtures", "jpeg")
    os.makedirs(out_dir, exist_ok=True)
    expected = {}
    for name, (src, kwargs) in fixture_recipes().items():
        kwargs = dict(kwargs)
        if kwargs.pop("progressive", False):
            blob = encode_jpeg_progressive(src, **kwargs)
        else:
            blob = encode_jpeg(src, **kwargs)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        arr = decode_jpeg(blob)
        assert arr is not None, name
        # "source" is independent of the decoder (pins the recipe);
        # "decoded" is a decoder-derived REGRESSION pin — correctness
        # rests on the test's decoded-vs-source error bounds
        expected[name] = {
            "source": hashlib.sha256(src.tobytes()).hexdigest()[:16],
            "decoded": hashlib.sha256(arr.tobytes()).hexdigest()[:16],
        }
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump(expected, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(expected)} fixtures + expected.json to {out_dir}")


if __name__ == "__main__":
    main()
