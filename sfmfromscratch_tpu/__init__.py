"""sfmfromscratch_tpu — a TPU-native Structure-from-Motion engine.

A brand-new JAX/XLA/Pallas/pjit implementation with the full capabilities of the
reference pipeline (reesque/SfmFromScratch): Harris + rotation/scale-invariant
RootSIFT features, NN-ratio matching, RANSAC essential-matrix pose, PnP chains,
batched DLT + nonlinear triangulation, and Levenberg-Marquardt bundle adjustment
with Schur-complement reduction — designed TPU-first:

* fixed-capacity masked tensors everywhere (XLA static shapes),
* batched hypothesis RANSAC (``vmap``) instead of Python loops,
* matmul-shaped inner loops that land on the MXU,
* Pallas kernels for the HBM-bound fused image ops and the blocked matcher,
* scaling over a ``jax.sharding.Mesh`` via ``shard_map`` + ``psum`` collectives.

Public API mirrors the reference's component inventory (see SURVEY.md §2).
"""

from sfmfromscratch_tpu.geometry.camera import (
    SensorType,
    intrinsics_from_exif,
    projection_matrix,
    project_points,
)
from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig, RansacConfig, PipelineConfig

__version__ = "0.1.0"
