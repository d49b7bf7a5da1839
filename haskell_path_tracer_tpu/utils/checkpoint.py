"""Checkpoint / resume of progressive render state.

The reference has no on-disk persistence; its in-memory analog is the
accumulator tuple (color sum + RNG state + iteration count) that makes
rendering resumable sample-by-sample (SURVEY.md §5).  This module
serializes exactly that tuple — plus scene parameters and optimizer state
during inverse rendering — so long renders and multi-host jobs restart
from the last checkpoint (the framework's failure-recovery story).

Format: a single .npz (atomic rename on write); orbax is deliberately not
required for this small state, keeping restarts dependency-light.
"""

from __future__ import annotations

import os
import tempfile

import jax
import numpy as np

from ..models.objects import Accumulator

FORMAT_VERSION = 1


def save_accumulator(path: str, acc: Accumulator, extra: dict | None = None) -> None:
    """Atomically write the accumulator (+ optional extra arrays)."""
    arrays = {
        "version": np.int32(FORMAT_VERSION),
        "color": np.asarray(acc.color),
        "rng": np.asarray(acc.rng),
        "iterations": np.asarray(acc.iterations),
    }
    for k, v in (extra or {}).items():
        arrays["extra_" + k] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_accumulator(path: str):
    """Returns (Accumulator, extra dict)."""
    with np.load(path) as z:
        version = int(z["version"])
        assert version == FORMAT_VERSION, version
        acc = Accumulator(
            color=jax.numpy.asarray(z["color"]),
            rng=jax.numpy.asarray(z["rng"]),
            iterations=jax.numpy.asarray(z["iterations"]),
        )
        extra = {
            k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
        }
    return acc, extra


def save_training_state(path: str, params, opt_state, step: int) -> None:
    """Checkpoint an inverse-rendering run: SceneParams + optimizer state."""
    leaves, treedef = jax.tree_util.tree_flatten((params, opt_state))
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["step"] = np.int64(step)
    arrays["version"] = np.int32(FORMAT_VERSION)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_training_state(path: str, params_like, opt_state_like):
    """Restore (params, opt_state, step) using example pytrees for
    structure."""
    _, treedef = jax.tree_util.tree_flatten((params_like, opt_state_like))
    with np.load(path) as z:
        n = len([k for k in z.files if k.startswith("leaf_")])
        leaves = [jax.numpy.asarray(z[f"leaf_{i}"]) for i in range(n)]
        step = int(z["step"])
    params, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, step
