from . import dedup_stream, ops, stateful
