"""Small-table row fetches as one-hot MXU contractions.

TPU element-gathers execute at ~7ns/element (scalar rate), so fetching a
dozen per-lane attributes from small SoA tables costs milliseconds per call
at wavefront sizes. For tables of up to a few thousand rows it is far
cheaper to build a one-hot (R, M) matrix on the VPU and contract it with the
packed (M, D) table on the MXU — one compare pass + one matmul instead of D
element-gathers. (The same idea drives the gather-free spectral evaluator,
spectrum/spectral.py.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math3d import Array

# Above this row count the (R, M) one-hot's memory traffic overtakes the
# gather cost; fall back to plain indexing.
ONEHOT_MAX_ROWS = 4096


def onehot_fetch(table: Array, ids: Array) -> Array:
    """table (M, D) f32, ids (...,) int -> (..., D) rows.

    Integer attributes survive exactly as f32 (values < 2^24); callers cast
    back with .astype(jnp.int32)."""
    m = table.shape[0]
    if m > ONEHOT_MAX_ROWS:
        return table[jnp.clip(ids, 0, m - 1)]
    idc = jnp.clip(ids, 0, m - 1)
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, idc.shape + (m,), idc.ndim)
        == idc[..., None]
    ).astype(table.dtype)
    return oh @ table


def pack_columns(*cols: Array) -> Array:
    """Stack 1-D/2-D per-row attributes into one (M, D) f32 table."""
    parts = []
    for c in cols:
        c = jnp.asarray(c, jnp.float32)
        parts.append(c[:, None] if c.ndim == 1 else c.reshape(c.shape[0], -1))
    return jnp.concatenate(parts, axis=1)
