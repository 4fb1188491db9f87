"""Build the native host-side components (C++ -> shared objects, ctypes ABI).

Runs automatically on first use (bindings.py) and caches the .so files next to
the sources; safe to re-run (`python -m sfmfromscratch_tpu.native.build`).
"""

from __future__ import annotations

import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))

TARGETS = {
    "libsfmpre.so": ["preprocess.cpp"],
    "libsfmtrack.so": ["trackgraph.cpp"],
}

_FLAGS = ["-O3", "-shared", "-fPIC", "-std=c++17"]


def build(force: bool = False, quiet: bool = True) -> bool:
    """Compile all targets; returns True when every .so is present."""
    ok = True
    for out, srcs in TARGETS.items():
        out_path = os.path.join(_HERE, out)
        src_paths = [os.path.join(_HERE, s) for s in srcs]
        if not force and os.path.exists(out_path) and all(
            os.path.getmtime(out_path) >= os.path.getmtime(s) for s in src_paths
        ):
            continue
        cmd = ["g++", *_FLAGS, *src_paths, "-o", out_path]
        try:
            subprocess.run(
                cmd, check=True,
                capture_output=quiet,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            if not quiet:
                print(f"native build failed for {out}: {e}", file=sys.stderr)
            ok = False
    return ok and all(
        os.path.exists(os.path.join(_HERE, out)) for out in TARGETS
    )


if __name__ == "__main__":
    sys.exit(0 if build(force=True, quiet=False) else 1)
