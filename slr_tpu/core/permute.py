"""Row-permutation of a pytree of per-lane arrays via ONE packed gather.

`jax.tree.map(lambda a: a[order], tree)` emits one gather per leaf; on TPU
each per-lane gather lowers to the scalar core (~0.2 ms per 49k lanes on
v5e), so permuting a ~25-leaf path state costs ~5 ms per bounce. Packing
every leaf into a single (R, K) f32 matrix (ints/bools bitcast — a gather
only moves bits), permuting rows once, and slicing back costs three
bandwidth passes over the state instead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def unpermute_rows(tree, order):
    """Inverse of permute_rows(tree, order) WITHOUT materializing the
    inverse permutation: one packed row scatter (out[order[i]] = in[i]).
    (A gather-by-inverse variant — argsort(order) then packed[inv] —
    measured ~10% SLOWER end-to-end in the BPT pass: the extra argsort
    costs more than the scatter saves.)"""
    leaves, treedef = jax.tree.flatten(tree)
    r = order.shape[0]
    cols = []
    specs = []
    for x in leaves:
        assert x.shape[0] == r, (x.shape, r)
        flat = x.reshape(r, -1)
        if flat.dtype == jnp.bool_:
            f = flat.astype(jnp.float32)
        elif flat.dtype == jnp.float32:
            f = flat
        else:
            f = jax.lax.bitcast_convert_type(flat, jnp.float32)
        cols.append(f)
        specs.append((x.dtype, x.shape, flat.shape[1]))
    packed = jnp.concatenate(cols, axis=1)
    packed = jnp.zeros_like(packed).at[order].set(packed)
    out = []
    off = 0
    for dtype, shape, k in specs:
        sl = packed[:, off:off + k]
        off += k
        if dtype == jnp.bool_:
            sl = sl != 0.0
        elif dtype != jnp.float32:
            sl = jax.lax.bitcast_convert_type(sl, dtype)
        out.append(sl.reshape(shape))
    return jax.tree.unflatten(treedef, out)


def permute_rows(tree, order):
    """Return `tree` with every leaf's leading axis permuted by `order`.

    All leaves must share the leading dimension == order.shape[0] and have
    32-bit dtypes (f32/i32/u32) or bool.
    """
    leaves, treedef = jax.tree.flatten(tree)
    r = order.shape[0]
    cols = []
    specs = []
    for x in leaves:
        assert x.shape[0] == r, (x.shape, r)
        flat = x.reshape(r, -1)
        if flat.dtype == jnp.bool_:
            f = flat.astype(jnp.float32)
        elif flat.dtype == jnp.float32:
            f = flat
        else:
            f = jax.lax.bitcast_convert_type(flat, jnp.float32)
        cols.append(f)
        specs.append((x.dtype, x.shape, flat.shape[1]))
    packed = jnp.concatenate(cols, axis=1)
    packed = packed[order]
    out = []
    off = 0
    for dtype, shape, k in specs:
        sl = packed[:, off:off + k]
        off += k
        if dtype == jnp.bool_:
            sl = sl != 0.0
        elif dtype != jnp.float32:
            sl = jax.lax.bitcast_convert_type(sl, dtype)
        out.append(sl.reshape(shape))
    return jax.tree.unflatten(treedef, out)
