"""Generate committed test fixtures under fixtures/.

Deterministic, pyarrow-written (NOT Spark-written) so reading them
exercises the foreign-parquet scan path. Mirrors the reference's
nested-ragged dataset fixture (list<list<int64>> scan + roundtrip,
reference hybridbackend/tensorflow/data/tests/
parquet_dataset_ragged_nested_test.py:43-75).

Run from the repo root: python tools/make_fixtures.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def nested_ragged(path: str, n_rows: int = 200) -> None:
    """id int64, matrix list<list<int64>>, weights list<list<float64>>.

    Outer size cycles 0..4 (including empty outer lists), inner sizes
    cycle 0..3 (including empty inner lists); values are a deterministic
    function of (row, i, j).
    """
    ids, matrices, weights = [], [], []
    for r in range(n_rows):
        outer_n = r % 5
        mat, wt = [], []
        for i in range(outer_n):
            inner_n = (r + i) % 4
            mat.append([r * 100 + i * 10 + j for j in range(inner_n)])
            wt.append([round((r + i + j) * 0.5, 1) for j in range(inner_n)])
        ids.append(r)
        matrices.append(mat)
        weights.append(wt)
    table = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "matrix": pa.array(matrices, pa.list_(pa.list_(pa.int64()))),
            "weights": pa.array(weights, pa.list_(pa.list_(pa.float64()))),
        }
    )
    pq.write_table(table, path, compression="zstd")


def main() -> None:
    os.makedirs(FIXTURES, exist_ok=True)
    nested_ragged(os.path.join(FIXTURES, "nested_ragged.parquet"))
    print(f"wrote {FIXTURES}/nested_ragged.parquet")


if __name__ == "__main__":
    main()
