"""Render checkpoint / resume.

The reference's only resumable artifact is its progressive power-of-2 image
dumps — the accumulation buffer itself is never persisted
(PathTracingRenderer.cpp:83-94; SURVEY.md §5). Here the film accumulator +
sample counter form a pure pytree, so a render can snapshot at every export
and resume exactly (the counter-based RNG makes the continuation identical
to an uninterrupted run). Uses orbax when importable, else a plain .npz.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np


def _orbax():
    try:
        import orbax.checkpoint as ocp  # noqa: PLC0415

        return ocp
    except Exception:
        return None


def save_checkpoint(path: str, state: dict[str, Any]) -> None:
    """Persist a dict of arrays / scalars. `path` is a directory (orbax) or
    gets '.npz' appended (fallback)."""
    state = {k: np.asarray(v) for k, v in state.items()}
    ocp = _orbax()
    if ocp is not None:
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, state, force=True)
        return
    np.savez(path + ".npz", **state)


def load_checkpoint(path: str) -> Optional[dict[str, Any]]:
    """Load a checkpoint previously written by save_checkpoint; None if
    absent."""
    ocp = _orbax()
    if ocp is not None and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        return dict(ckptr.restore(os.path.abspath(path)))
    if os.path.exists(path + ".npz"):
        with np.load(path + ".npz") as z:
            return {k: z[k] for k in z.files}
    return None
