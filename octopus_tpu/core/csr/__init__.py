from .measures import compute_measures, MeasureContext
from .threshold import ThresholdFilter, parse_filter_expression
