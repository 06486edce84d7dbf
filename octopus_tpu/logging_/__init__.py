from .progress import ProgressMeter
