"""Checkpoint / resume.

The reference's only persistence is STL round-tripping of intermediate
meshes (reference/mesh.cpp:399-430, used as save/reload in
reference/test.cpp:109-113).  Here every pipeline stage has a first-class
binary checkpoint:

* `save_patches`/`load_patches` — the preprocessed BezierPatches SoA as one
  .npz (the expensive host preprocessing + Bezier build never has to rerun);
* `save_params`/`load_params` — lens-optimization state (LensParams + step)
  as atomic .npz files, so long optimization loops resume after preemption
  (see `latest_checkpoint` for the resume scan).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..bezier.patches import BezierPatches

_PATCH_FIELDS = BezierPatches._fields


def save_patches(path: str, patches: BezierPatches) -> None:
    arrays = {f: np.asarray(leaf) for f, leaf in zip(_PATCH_FIELDS, patches)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_patches(path: str) -> BezierPatches:
    with np.load(path) as data:
        return BezierPatches(
            *(jnp.asarray(data[f]) for f in _PATCH_FIELDS)
        )


def save_params(path: str, params, step: int = 0) -> None:
    """Save a LensParams-like NamedTuple (+ step counter)."""
    arrays = {f: np.asarray(v) for f, v in params._asdict().items()}
    arrays["__step__"] = np.asarray(step, np.int64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrays)
    os.replace(tmp, path)


def load_params(path: str, params_cls) -> Tuple[object, int]:
    """Load params saved by `save_params`; returns (params, step)."""
    with np.load(path) as data:
        step = int(data["__step__"]) if "__step__" in data else 0
        params = params_cls(
            *(jnp.asarray(data[f]) for f in params_cls._fields)
        )
    return params, step


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    """Highest-step checkpoint file `{prefix}{step}.npz` in a directory."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                step = int(name[len(prefix):-4])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
