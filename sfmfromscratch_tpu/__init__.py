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

import os as _os

# Persistent XLA compilation cache: frontend/RANSAC/BA programs take minutes
# to compile over the tunneled TPU; caching them across processes turns every
# run after the first into a warm start. Opt out with SFM_TPU_COMPILE_CACHE=0.
#
# TPU-requested processes ONLY. A cached CPU entry is AOT machine code for the
# *compiling* host's CPU; executing it on a CPU without those instruction-set
# extensions SIGILLs mid-program, and the loader only warns. CPU-identity
# fingerprints in the path do not make this safe either: under VMs (this
# environment is a Firecracker guest) /proc/cpuinfo is templated identically
# across physical hosts while LLVM's CPUID-based host detection — what XLA
# actually compiles for — sees the real silicon. Observed here as a crash in
# xla::cpu::ThunkExecutor after the AOT feature-mismatch warning. TPU
# executables target the accelerator, not the host, so they stay portable.
if _os.environ.get("SFM_TPU_COMPILE_CACHE", "1") != "0":
    import jax as _jax

    def _tpu_requested() -> bool:
        plats = _os.environ.get("JAX_PLATFORMS", "")
        try:
            plats = _jax.config.jax_platforms or plats
        except AttributeError:  # pragma: no cover - very old jax
            pass
        return any(p in (plats or "").lower() for p in ("tpu", "axon"))

    if _tpu_requested():
        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/sfmfromscratch_tpu/xla-tpu"),
        )
        try:
            _os.makedirs(_cache_dir, exist_ok=True)
            _jax.config.update("jax_compilation_cache_dir", _cache_dir)
            _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        except Exception:  # pragma: no cover - cache is best-effort
            pass

from sfmfromscratch_tpu.geometry.camera import (
    SensorType,
    intrinsics_from_exif,
    projection_matrix,
    project_points,
)
from sfmfromscratch_tpu.config import ExtractorConfig, MatcherConfig, RansacConfig, PipelineConfig

__version__ = "0.1.0"
