"""UDF/UDAF extension surface (SURVEY §2.12).

The reference's extension point is C++ TF ops plus Python graph rewriting;
the Spark-native equivalents are, in preference order:

1. Column expressions composed from ``pyspark.sql.functions`` — JVM-side,
   codegen'd; this is what every operator in this package uses.
2. ``pandas_udf`` (scalar / grouped-agg) — Arrow-vectorized Python, for
   numerics that genuinely need numpy.
3. ``applyInPandas`` / ``mapInPandas`` — per-group / per-batch pandas
   (see ``operators/multimodal.py`` for the canonical use).
4. Row-at-a-time ``F.udf`` — never in hot paths.

This module provides ready-made Arrow-vectorized UDFs for vector math on
``array<float>`` embedding columns (the workload the reference runs on
GPUs), plus a registration helper so they are callable from SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.types import ArrayType, DoubleType

__all__ = ["vec_l2_norm", "vec_scale", "vec_mean_agg", "register_udfs"]


@F.pandas_udf(DoubleType())
def vec_l2_norm(v: pd.Series) -> pd.Series:
    """L2 norm of an array column (Arrow-batched numpy)."""
    import numpy as np

    return v.map(lambda x: float(np.linalg.norm(np.asarray(x, dtype="float64"))))


@F.pandas_udf(ArrayType(DoubleType()))
def vec_scale(v: pd.Series, s: pd.Series) -> pd.Series:
    """Element-wise scale of an array column by a scalar column."""
    import numpy as np

    return pd.Series(
        [
            (np.asarray(a, dtype="float64") * b).tolist() if a is not None else None
            for a, b in zip(v, s)
        ]
    )


@F.pandas_udf(ArrayType(DoubleType()))
def vec_mean_agg(v: pd.Series) -> list:
    """Grouped-agg pandas UDF: element-wise mean of vectors per group
    (the pooled-lookup 'mean' combiner as a UDAF)."""
    import numpy as np

    stacked = np.stack([np.asarray(x, dtype="float64") for x in v])
    return stacked.mean(axis=0).tolist()


def register_udfs(spark: SparkSession) -> None:
    """Expose the vector UDFs to SQL (``SELECT vec_l2_norm(embedding) ...``)."""
    spark.udf.register("vec_l2_norm", vec_l2_norm)
    spark.udf.register("vec_scale", vec_scale)
    spark.udf.register("vec_mean_agg", vec_mean_agg)
