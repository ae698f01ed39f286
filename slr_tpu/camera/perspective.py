"""Thin-lens perspective camera ray generation.

Reference: libSLR/Cameras/PerspectiveCamera.{h,cpp} — lens position sampling
on a concentric disk (areaPDF = 1/(pi r^2)), image-plane direction through the
focus plane with PDF = d_img^2 / (cos^3 * A_img), and the default sensor
sensitivity 1/(pi r^2) (PerspectiveCamera.cpp:15-57, :63-99).

Camera space: right-handed, looking down +z (the scene DSL applies a
rotateY(pi) on top for SLR-style cameras).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math3d import Array, normalize, transform_point, transform_vector
from ..core.sampling import concentric_sample_disk
from ..scene.types import Camera


class CameraRays(NamedTuple):
    o: Array        # (R, 3) world-space origins
    d: Array        # (R, 3) world-space directions
    weight: Array   # (R,) We0*We1*cos / (areaPDF * dirPDF); spectral-flat


def camera_derived(cam: Camera):
    op_height = 2.0 * cam.obj_dist * jnp.tan(cam.fovy * 0.5)
    op_width = op_height * cam.aspect
    img_area = op_width * op_height * (cam.img_dist / cam.obj_dist) ** 2
    return op_width, op_height, img_area


def sample_camera_rays_equirect(
    cam: Camera,
    px: Array,
    py: Array,
    width: int,
    height: int,
) -> CameraRays:
    """Equirectangular (environment) camera rays.

    Reference EquirectangularCamera/IDF (EquirectangularCamera.cpp:28-91):
    delta lens position, lat-long direction phi = phiAngle*u, theta =
    thetaAngle*v; direction fromPolarYUp = (-sin(phi)sin(theta), cos(theta),
    cos(phi)sin(theta)).

    DELIBERATE DEVIATION: the reference's IDF pdf uses (1 - y^2) = sin^2
    (EquirectangularCamera.cpp:59), but the true density of the lat-long
    mapping is 1/(phiAngle*thetaAngle*sin(theta)) — the reference's own
    BPT t=1 splats would disagree with its forward sampling by 1/sin(theta)
    (5x at 22 deg off the pole). No bundled reference scene exercises this
    camera, so there is no golden to mismatch; we use the correct density
    so PT and BPT converge to the same image (tests/test_features.py).
    """
    u = px / width
    v = py / height
    phi = cam.phi_angle * u
    theta = cam.theta_angle * v
    st = jnp.sin(theta)
    dir_local = jnp.stack(
        [-jnp.sin(phi) * st, jnp.cos(theta), jnp.cos(phi) * st], axis=-1
    )
    dir_pdf = 1.0 / (
        cam.phi_angle * cam.theta_angle * jnp.maximum(jnp.abs(st), 1e-6)
    )
    o = jnp.broadcast_to(cam.to_world[:3, 3], dir_local.shape)
    d = transform_vector(cam.to_world, dir_local)
    # weight = |dot(dir, gN)| / (areaPDF=1 * dirPDF); gN = camera z axis.
    weight = jnp.abs(dir_local[..., 2]) / dir_pdf
    return CameraRays(o=o, d=d, weight=weight)


def sample_camera_rays(
    cam: Camera,
    px: Array,
    py: Array,
    width: int,
    height: int,
    u_lens0: Array,
    u_lens1: Array,
) -> CameraRays:
    """Generate primary rays. px/py: (R,) continuous pixel positions.

    The combined estimator weight reproduces PathTracingRenderer.cpp:126:
      We0 * We1 * |cos| / (areaPDF * dirPDF)
    with We0 = We1 = 1, sensitivity folded in at the sensor
    (default sensitivity exactly cancels the lens area PDF).
    """
    op_width, op_height, img_area = camera_derived(cam)
    lx, ly = concentric_sample_disk(u_lens0, u_lens1)
    org_local = jnp.stack(
        [cam.lens_radius * lx, cam.lens_radius * ly, jnp.zeros_like(lx)], axis=-1
    )

    sx = px / width
    sy = py / height
    p_focus = jnp.stack(
        [
            op_width * (0.5 - sx),
            op_height * (0.5 - sy),
            jnp.broadcast_to(cam.obj_dist, sx.shape),
        ],
        axis=-1,
    )
    dir_local = normalize(p_focus - org_local)
    dir_pdf = (cam.img_dist * cam.img_dist) / (
        dir_local[..., 2] ** 3 * img_area
    )

    o = transform_point(cam.to_world, org_local)
    d = transform_vector(cam.to_world, dir_local)

    lens_area_pdf = jnp.where(
        cam.lens_radius > 0.0,
        1.0 / (jnp.pi * jnp.maximum(cam.lens_radius, 1e-12) ** 2),
        1.0,
    )
    sensitivity = jnp.where(
        cam.lens_radius > 0.0,
        1.0 / (jnp.pi * jnp.maximum(cam.lens_radius, 1e-12) ** 2),
        1.0,
    )
    # weight = sensitivity * cos / (areaPDF * dirPDF); cos = dir_local.z
    weight = sensitivity * jnp.abs(dir_local[..., 2]) / (lens_area_pdf * dir_pdf)
    return CameraRays(o=o, d=d, weight=weight)
