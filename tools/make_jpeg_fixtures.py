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

import numpy as np

from hybridbackend_spark.operators.jpeg import decode_jpeg
from test_jpeg import _smooth, encode_jpeg


def main() -> None:
    out_dir = os.path.join(REPO, "fixtures", "jpeg")
    os.makedirs(out_dir, exist_ok=True)
    fixtures = {
        "smooth_444_q90.jpg": encode_jpeg(_smooth(32, 40, seed=1), 90),
        "smooth_420_q85.jpg": encode_jpeg(
            _smooth(25, 33, seed=2), 85, subsample=True
        ),
        "gray_q90.jpg": encode_jpeg(_smooth(16, 16, seed=3), 90, gray=True),
        "restart_dri2_q88.jpg": encode_jpeg(
            _smooth(24, 32, seed=4), 88, restart_interval=2
        ),
        "flat_teal_q75.jpg": encode_jpeg(
            np.full((12, 20, 3), (0, 128, 128), dtype=np.uint8), 75
        ),
    }
    expected = {}
    for name, blob in fixtures.items():
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        arr = decode_jpeg(blob)
        assert arr is not None, name
        expected[name] = hashlib.sha256(arr.tobytes()).hexdigest()[:16]
    with open(os.path.join(out_dir, "expected.json"), "w") as f:
        json.dump(expected, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(fixtures)} fixtures + expected.json to {out_dir}")


if __name__ == "__main__":
    main()
