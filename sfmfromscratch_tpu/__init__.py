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
if _os.environ.get("SFM_TPU_COMPILE_CACHE", "1") != "0":
    import jax as _jax

    def _machine_tag() -> str:
        # Scope the default cache dir by CPU identity: XLA's CPU backend AOT
        # result embeds machine features, and loading an entry compiled on a
        # different host silently changes instruction selection (and can
        # SIGILL) — the loader only warns. A features fingerprint in the path
        # makes foreign entries invisible instead.
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        import hashlib

                        return hashlib.sha1(line.encode()).hexdigest()[:12]
        except OSError:
            pass
        import platform

        return platform.machine() or "unknown"

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser(f"~/.cache/sfmfromscratch_tpu/xla-{_machine_tag()}"),
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
