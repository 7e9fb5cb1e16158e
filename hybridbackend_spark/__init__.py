"""hybridbackend_spark: a PySpark-native analytics engine with the query and
data-processing capabilities of DeepRec-AI/HybridBackend, re-expressed
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Library-over-engine: composable DataFrame transforms + SQL functions;
Catalyst supplies optimization (pushdown, pruning, join selection, AQE).
"""

from .session import get_session
from .schema import Field, fields_to_struct, infer_fields, validate_files

__version__ = "0.1.0"
