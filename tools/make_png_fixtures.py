"""Regenerate the committed PNG fixtures + pinned pixel hashes used by
tests/test_png.py::test_fixture_pngs_pinned_exact.

Run from the repo root: python tools/make_png_fixtures.py
The encoder and the fixture recipes live in tests/test_png.py on
purpose — the encoder is independent of the production decoder, and
PNG is lossless, so "source" and "decoded" hashes must coincide.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from hybridbackend_spark.operators.png import decode_png
from test_png import encode_png, fixture_recipes


def main() -> None:
    import numpy as np

    out_dir = os.path.join(REPO, "fixtures", "png")
    os.makedirs(out_dir, exist_ok=True)
    expected = {}
    for name, (rgb, img, kwargs) in fixture_recipes().items():
        blob = encode_png(img, **kwargs)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        arr = decode_png(blob)
        assert arr is not None and np.array_equal(arr, rgb), name
        expected[name] = {
            "source": hashlib.sha256(rgb.tobytes()).hexdigest()[:16],
            "decoded": hashlib.sha256(arr.tobytes()).hexdigest()[:16],
        }
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump(expected, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(expected)} fixtures + expected.json to {out_dir}")


if __name__ == "__main__":
    main()
