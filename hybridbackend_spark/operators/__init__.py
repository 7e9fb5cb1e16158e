from . import dedup, exchange, graph, joins, multimodal, similarity, structural, text
