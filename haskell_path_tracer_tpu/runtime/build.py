"""Build the native runtime library (g++ -> libptru.so).

The reference's native substrate was externally pinned (LLVM JIT, CUDA,
SDL2 — SURVEY.md §2.2); here the native layer is in-repo and builds on
demand: first import compiles `native/ptru_native.cpp` with the system g++
and caches the .so next to the source, rebuilding only when the source is
newer.  Everything has a pure-Python fallback, so a missing toolchain only
costs speed, never capability.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_DIR, "native", "ptru_native.cpp")
LIBRARY = os.path.join(_DIR, "native", "libptru.so")

_CXX = os.environ.get("CXX", "g++")
# -ffp-contract=off: g++ contracts a*b+c into FMA by default at -O2,
# which perturbs t = tca - sqrt(r2 - d2) by an ulp relative to the
# numpy/JAX oracles and flips accept decisions on boundary rays — found
# by the three-way differential fuzzer (test_parity_fuzz) as a 0.5%-of-
# lanes RNG divergence on near-tie scenes.  The oracle must evaluate
# plain IEEE f32, like the implementations it cross-checks.
_FLAGS = [
    "-O2", "-ffp-contract=off", "-shared", "-fPIC", "-std=c++17",
    "-pthread",
]


class BuildError(RuntimeError):
    pass


def library_path(rebuild: bool = False) -> str:
    """Return the path of the built library, compiling if needed."""
    if (
        not rebuild
        and os.path.exists(LIBRARY)
        and os.path.getmtime(LIBRARY) >= os.path.getmtime(SOURCE)
    ):
        return LIBRARY
    # Atomic build: compile to a temp name, rename over the old library so
    # concurrent importers never dlopen a half-written file.
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(LIBRARY), suffix=".so")
    os.close(fd)
    cmd = [_CXX, *_FLAGS, SOURCE, "-o", tmp, "-lz"]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        os.unlink(tmp)
        raise BuildError(f"native build failed to run: {e}") from e
    if proc.returncode != 0:
        os.unlink(tmp)
        raise BuildError(
            f"native build failed:\n$ {' '.join(cmd)}\n{proc.stderr}"
        )
    os.replace(tmp, LIBRARY)
    return LIBRARY
