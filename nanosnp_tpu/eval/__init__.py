from .f1 import evaluate_calls, F1Result
from .diff import diff_vcfs, VcfDiff
