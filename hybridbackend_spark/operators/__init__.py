from . import dedup, exchange, joins, multimodal, similarity, structural, text
