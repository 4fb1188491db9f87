"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

This is the standard JAX substitute for a fake distributed backend (SURVEY.md §4):
sharding/collective tests run against 8 virtual CPU devices, and the same code
paths run unchanged on a real TPU slice.
"""

import os

# Must happen before jax initializes its backends. Force CPU: the session
# pre-imports jax with jax_platforms pinned to the tunneled TPU ('axon,cpu'),
# so both the env var AND the config must be overridden. Tests run on the
# virtual 8-device CPU mesh; set SFM_TEST_TPU=1 to run on the real chip.
# Tests compile fast on CPU and must not read entries a previous (possibly
# different-machine) run wrote: stale CPU AOT binaries change float numerics
# silently. The real-chip paths (bench, CLI) keep the persistent cache.
os.environ.setdefault("SFM_TPU_COMPILE_CACHE", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

if not os.environ.get("SFM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

# Raise the kernel mmap ceiling when we can (container runs as root): every
# XLA:CPU executable holds ~18 mappings and the default 65530 ceiling forces
# the _xla_map_guard below to jax.clear_caches() mid-suite, recompiling every
# shared program afterwards (~tens of seconds per dump).  Best-effort and
# POLITE: the original value is restored at interpreter exit (the setting is
# host-wide; co-located workloads must not inherit our tuning), and
# SFM_NO_SYSCTL=1 opts out entirely.  The guard remains the fallback when
# the sysctl is not writable.
_MAP_GUARD_THRESHOLD = 40_000
if not os.environ.get("SFM_NO_SYSCTL"):
    try:
        with open("/proc/sys/vm/max_map_count", "r+") as _f:
            _old_map_count = int(_f.read())
            if _old_map_count < 262_144:
                _f.seek(0)
                _f.write("262144")

                import atexit

                def _restore_map_count(old=_old_map_count):
                    try:
                        with open("/proc/sys/vm/max_map_count", "w") as f:
                            f.write(str(old))
                    except OSError:
                        pass

                atexit.register(_restore_map_count)
        with open("/proc/sys/vm/max_map_count") as _f:
            _MAP_GUARD_THRESHOLD = int(int(_f.read()) * 0.6)
    except OSError:
        pass


@pytest.fixture(autouse=True)
def _xla_map_guard():
    """Keep the process under the kernel's vm.max_map_count (65530 default).

    Every XLA:CPU compiled executable holds ~18 memory mappings; a full-suite
    run accumulates ~65k maps and the NEXT compile's mmap failure surfaces as
    a SIGSEGV inside LLVM (measured: maps=65093 at the crash, bisected via
    /proc/<pid>/maps polling — the crash test itself is innocent, it is just
    whoever compiles first past the ceiling). jax.clear_caches() releases the
    executables (5731 -> 505 maps in a 300-program probe), so drop the caches
    whenever the count nears the limit; compile reuse is preserved the rest
    of the time."""
    yield
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > _MAP_GUARD_THRESHOLD:
        jax.clear_caches()


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same fresh stream regardless of
    # which other tests ran (order-independent determinism).
    return np.random.default_rng(5)


def synthetic_scene(rng, num_points=64, noise=0.0, img_size=(640, 480)):
    """A random well-conditioned two-view scene with known ground truth."""
    import numpy as np

    w, h = img_size
    K = np.array([[520.0, 0.0, w / 2], [0.0, 520.0, h / 2], [0.0, 0.0, 1.0]])
    # Points in a box in front of both cameras.
    X = np.stack(
        [
            rng.uniform(-2.0, 2.0, num_points),
            rng.uniform(-1.5, 1.5, num_points),
            rng.uniform(4.0, 9.0, num_points),
        ],
        axis=1,
    )
    R1, t1 = np.eye(3), np.zeros(3)
    # Second camera: small rotation + translation.
    from scipy.spatial.transform import Rotation

    R2 = Rotation.from_rotvec([0.03, -0.25, 0.02]).as_matrix()
    t2 = np.array([-0.8, 0.05, 0.1])

    def project(X, R, t):
        c = X @ R.T + t
        p = c @ K.T
        return p[:, :2] / p[:, 2:3]

    p1 = project(X, R1, t1) + noise * rng.standard_normal((num_points, 2))
    p2 = project(X, R2, t2) + noise * rng.standard_normal((num_points, 2))
    return dict(K=K, X=X, R1=R1, t1=t1, R2=R2, t2=t2, p1=p1, p2=p2)


@pytest.fixture
def scene(rng):
    return synthetic_scene(rng)
