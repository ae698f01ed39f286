"""Traversal-cost scaling: per-block worklist size must grow sublinearly
in the scene's entry count (VERDICT r4 item 1 acceptance: the per-ray
ordered descent of the reference visits O(log n) nodes — SBVH.h:417-442;
our wavefront analogue is the contact-point sort + exact per-ray cull,
whose per-block unions should track per-ray truth, not O(NE)).

Quick tier: worklist construction is plain XLA and runs on CPU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick


def _mean_entries_per_block(scene, w, h, rb=128):
    from slr_tpu.accel.pallas_intersect import (
        RAY_EPSILON, _build_worklist, _pack_rays, _ray_ranges,
        _scene_exit_clamp)
    from slr_tpu.camera.perspective import sample_camera_rays
    from slr_tpu.render.pt import _ray_sort_key

    pt = scene.pallas_tris
    r = w * h
    px = (jnp.arange(r) % w).astype(jnp.float32) + 0.5
    py = (jnp.arange(r) // w).astype(jnp.float32) + 0.5
    zeros = jnp.zeros((r,), jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, jnp.uint32(w),
                              jnp.uint32(h), zeros, zeros)
    key = _ray_sort_key(scene, rays.o, rays.d, jnp.ones((r,), bool))
    order = jnp.argsort(key)
    o, d = rays.o[order], rays.d[order]
    tmin_a, tmax_a = _ray_ranges(r, RAY_EPSILON, jnp.inf, None)
    tmax_a = _scene_exit_clamp(o, d, tmax_a, pt.boxes)
    packed, _ = _pack_rays(o, d, tmin_a, tmax_a, rb,
                           f=zeros if scene.instances is not None else None)
    _, cnt, _ = _build_worklist(packed, pt.boxes)
    return float(np.asarray(cnt).mean()), pt.n_entries


def test_worklist_grows_sublinearly_in_entries():
    """4x the instances (~4x the worklist entries) must cost well under
    2x the per-block visited entries: the cull + contact grouping keeps
    per-block work near per-ray truth instead of O(NE)."""
    from slr_tpu.scene.presets import grass_field

    small = grass_field(n_side=24, blade_segments=9, animated_fraction=0.25)
    big = grass_field(n_side=48, blade_segments=9, animated_fraction=0.25)
    m_small, ne_small = _mean_entries_per_block(small, 128, 96)
    m_big, ne_big = _mean_entries_per_block(big, 128, 96)
    growth_ne = ne_big / ne_small
    growth_blk = m_big / max(m_small, 1e-9)
    assert growth_ne > 2.5          # the scene really did scale
    assert growth_blk < 0.6 * growth_ne, (
        f"per-block entries grew {growth_blk:.2f}x for {growth_ne:.2f}x "
        f"entries — traversal cull is not sublinear")


def test_per_ray_truth_is_small():
    """Exact per-ray slab-pass count stays O(10) on the instanced scene —
    the quantity the block unions are chasing."""
    from slr_tpu.scene.presets import grass_field
    from slr_tpu.camera.perspective import sample_camera_rays

    scene = grass_field(n_side=32, blade_segments=9, animated_fraction=0.25)
    pt = scene.pallas_tris
    w, h = 96, 64
    r = w * h
    px = (jnp.arange(r) % w).astype(jnp.float32) + 0.5
    py = (jnp.arange(r) // w).astype(jnp.float32) + 0.5
    zeros = jnp.zeros((r,), jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, jnp.uint32(w),
                              jnp.uint32(h), zeros, zeros)
    o, d = rays.o, rays.d
    boxes = np.asarray(pt.boxes)
    ov = np.asarray(o)[:, None, :]
    dv = np.asarray(d)[:, None, :]
    inv = 1.0 / np.where(np.abs(dv) < 1e-20,
                         np.where(dv >= 0, 1e-20, -1e-20), dv)
    t0 = (boxes[None, :, 0:3] - ov) * inv
    t1 = (boxes[None, :, 3:6] - ov) * inv
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    ok = (tn <= tf) & (tf >= 0) & (boxes[None, :, 6] > 0.5)
    per_ray = ok.sum(axis=1)
    assert per_ray.mean() < 16, per_ray.mean()
