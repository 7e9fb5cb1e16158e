from . import feature, metrics, udf, windows
