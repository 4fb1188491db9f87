from sfmfromscratch_tpu.ops.lie import so3_exp, so3_log, so3_hat
from sfmfromscratch_tpu.ops.smallsvd import smallest_eigvec_sym, nullvec_lstsq
