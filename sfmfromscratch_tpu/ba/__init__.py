from sfmfromscratch_tpu.ba.problem import BAProblem, make_problem
from sfmfromscratch_tpu.ba.lm import bundle_adjust, BAResult
