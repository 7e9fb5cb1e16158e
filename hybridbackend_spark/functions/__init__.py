from . import feature, metrics, windows
