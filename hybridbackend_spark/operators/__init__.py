from . import structural, joins
