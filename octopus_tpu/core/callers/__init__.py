from .individual import IndividualCaller, CallerConfig
