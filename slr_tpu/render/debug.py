"""AOV / debug renderer.

Reference: libSLR/Renderers/DebugRenderer.{h,cpp} — one camera ray per pixel,
records first-hit geometric normal / shading normal / shading tangent /
distance channels (DebugRenderer.h:18-24, cpp:161-190). Used to validate
geometry and frames independently of light transport.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..camera.perspective import sample_camera_rays
from ..render.pt import resolve_sp, scene_intersect
from ..scene.types import FlatScene


class AOVs(NamedTuple):
    g_normal: jnp.ndarray   # (H, W, 3)
    s_normal: jnp.ndarray   # (H, W, 3)
    s_tangent: jnp.ndarray  # (H, W, 3)
    distance: jnp.ndarray   # (H, W)
    hit: jnp.ndarray        # (H, W) bool
    mat_id: jnp.ndarray     # (H, W) int32
    uv: jnp.ndarray         # (H, W, 2)


def render_aovs(scene: FlatScene, width: int, height: int,
                time_f: float = 0.5) -> AOVs:
    """First-hit AOV pass (DebugRenderer.cpp:161-190). Animated/instanced
    scenes are sampled at shutter fraction `time_f` (mid-shutter by
    default — the reference's DebugRenderer samples a time per pixel,
    cpp:167; a deterministic AOV pass wants one fixed time instead)."""
    n_pix = width * height
    pixel_id = jnp.arange(n_pix, dtype=jnp.uint32)
    px = (pixel_id % width).astype(jnp.float32) + 0.5
    py = (pixel_id // width).astype(jnp.float32) + 0.5
    half = jnp.full((n_pix,), 0.5, jnp.float32)
    rays = sample_camera_rays(scene.camera, px, py, width, height, half, half)

    f = (jnp.full((n_pix,), time_f, jnp.float32)
         if scene.instances is not None else None)
    hit = scene_intersect(scene, rays.o, rays.d, f=f)
    # resolve_sp applies the instance transform at `f` to the shading frame
    # (TransformedSurfaceObject::getSurfacePoint, SurfaceObject.cpp:329-336).
    sp = resolve_sp(scene, hit, rays.o, rays.d, f=f)

    def img3(x):
        return jnp.where(hit.mask[:, None], x, 0.0).reshape(height, width, 3)

    return AOVs(
        g_normal=img3(sp.gn),
        s_normal=img3(sp.sn),
        s_tangent=img3(sp.tangent),
        distance=jnp.where(hit.mask, hit.t, 0.0).reshape(height, width),
        hit=hit.mask.reshape(height, width),
        mat_id=jnp.where(hit.mask, sp.mat_id, -1).reshape(height, width),
        uv=jnp.where(hit.mask[:, None], sp.uv, 0.0).reshape(height, width, 2),
    )
