"""Vector math over SoA arrays of 3-vectors.

TPU-native counterpart of the reference's templated vector types
(reference: libSLR/BasicTypes/Vector3.h, Point3.h, Normal3.h, Matrix4x4.h).
Instead of scalar vector classes, every function here operates on arrays whose
last axis has size 3, so a "vector" is `(..., 3)` and whole wavefronts of rays
are processed at once on the VPU.

All functions are jit-safe and differentiable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

INF = jnp.inf


def dot(a: Array, b: Array) -> Array:
    """Batched dot product over the last axis. Returns (...).

    For 3-vectors, explicit component slices: a minor-axis reduce over a
    size-3 dim lowers ~20x slower on TPU (measured 60 us vs 3 us per 49k
    lanes) than three lane-aligned multiplies."""
    if a.shape[-1] == 3 or b.shape[-1] == 3:
        return (a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
                + a[..., 2] * b[..., 2])
    return jnp.sum(a * b, axis=-1)


def absdot(a: Array, b: Array) -> Array:
    return jnp.abs(dot(a, b))


def cross(a: Array, b: Array) -> Array:
    """Explicit component form (jnp.cross lowers through rolls/reduces that
    are slow on the TPU minor axis)."""
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack(
        [ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1
    )


def length2(a: Array) -> Array:
    return dot(a, a)


def length(a: Array) -> Array:
    return jnp.sqrt(length2(a))


def normalize(a: Array, eps: float = 0.0) -> Array:
    """Normalize over the last axis; `eps` guards the degenerate zero vector."""
    n2 = length2(a)
    inv = jax.lax.rsqrt(jnp.maximum(n2, eps if eps > 0 else jnp.finfo(a.dtype).tiny))
    return a * inv[..., None]


def vec3(x, y, z, dtype=jnp.float32) -> Array:
    return jnp.stack(
        [jnp.asarray(x, dtype), jnp.asarray(y, dtype), jnp.asarray(z, dtype)], axis=-1
    )


def reflect(v: Array, n: Array) -> Array:
    """Mirror `v` about normal `n` (both pointing away from surface)."""
    return 2.0 * dot(v, n)[..., None] * n - v


def distance(a: Array, b: Array) -> Array:
    return length(b - a)


# ---------------------------------------------------------------------------
# 4x4 homogeneous transforms (host-side scene building mostly, but jit-safe).
# Reference: libSLR/BasicTypes/Matrix4x4.h, libSLR/Core/Transform.h
# ---------------------------------------------------------------------------

def mat_identity(dtype=jnp.float32) -> Array:
    return jnp.eye(4, dtype=dtype)


def mat_translate(t: Array) -> Array:
    m = jnp.eye(4, dtype=jnp.result_type(t, jnp.float32))
    return m.at[:3, 3].set(jnp.asarray(t))


def mat_scale(s) -> Array:
    s = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s, jnp.ones((1,), s.dtype)]))


def _rot(axis: int, angle) -> Array:
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    i, j = [(1, 2), (2, 0), (0, 1)][axis]
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[i, i].set(c).at[i, j].set(-s).at[j, i].set(s).at[j, j].set(c)
    return m


def mat_rotate_x(angle) -> Array:
    return _rot(0, jnp.asarray(angle, jnp.float32))


def mat_rotate_y(angle) -> Array:
    return _rot(1, jnp.asarray(angle, jnp.float32))


def mat_rotate_z(angle) -> Array:
    return _rot(2, jnp.asarray(angle, jnp.float32))


def mat_rotate(angle, axis: Array) -> Array:
    """Rodrigues rotation about arbitrary axis (reference: Matrix4x4.cpp rotate)."""
    a = normalize(jnp.asarray(axis, jnp.float32))
    x, y, z = a[0], a[1], a[2]
    c, s = jnp.cos(angle), jnp.sin(angle)
    oc = 1.0 - c
    m3 = jnp.array(
        [
            [c + x * x * oc, x * y * oc - z * s, x * z * oc + y * s],
            [y * x * oc + z * s, c + y * y * oc, y * z * oc - x * s],
            [z * x * oc - y * s, z * y * oc + x * s, c + z * z * oc],
        ],
        jnp.float32,
    )
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(m3)


def mat_look_at(eye: Array, target: Array, up: Array) -> Array:
    """Camera-to-world matrix (reference: Matrix4x4 lookAt semantics)."""
    eye = jnp.asarray(eye, jnp.float32)
    z = normalize(jnp.asarray(target, jnp.float32) - eye)
    x = normalize(cross(normalize(jnp.asarray(up, jnp.float32)), z))
    y = cross(z, x)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, 0].set(x).at[:3, 1].set(y).at[:3, 2].set(z).at[:3, 3].set(eye)
    return m


def transform_point(m: Array, p: Array) -> Array:
    """Apply 4x4 `m` to points `(..., 3)`."""
    return jnp.einsum("ij,...j->...i", m[:3, :3], p) + m[:3, 3]


def transform_vector(m: Array, v: Array) -> Array:
    return jnp.einsum("ij,...j->...i", m[:3, :3], v)


def transform_normal(m_inv: Array, n: Array) -> Array:
    """Transform normals with the inverse-transpose: pass the *inverse* matrix."""
    return jnp.einsum("ji,...j->...i", m_inv[:3, :3], n)


# ---------------------------------------------------------------------------
# Orthonormal frames (reference: libSLR/Core/geometry.h ReferenceFrame :225-235)
# ---------------------------------------------------------------------------

def onb_from_z(z: Array) -> tuple[Array, Array, Array]:
    """Build a right-handed orthonormal basis given unit z (branchless Frisvad/
    Duff et al. 2017). Returns (x, y, z) each (..., 3)."""
    zz = z[..., 2]
    sign = jnp.where(zz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + zz)
    b = z[..., 0] * z[..., 1] * a
    x = jnp.stack(
        [1.0 + sign * z[..., 0] * z[..., 0] * a, sign * b, -sign * z[..., 0]],
        axis=-1,
    )
    y = jnp.stack([b, sign + z[..., 1] * z[..., 1] * a, -z[..., 1]], axis=-1)
    return x, y, z


def frame_to_local(x: Array, y: Array, z: Array, v: Array) -> Array:
    """World -> frame-local coordinates (z is the shading normal axis)."""
    return jnp.stack([dot(v, x), dot(v, y), dot(v, z)], axis=-1)


def frame_from_local(x: Array, y: Array, z: Array, v: Array) -> Array:
    return (
        v[..., 0:1] * x + v[..., 1:2] * y + v[..., 2:3] * z
    )


def spherical_direction(sin_theta: Array, cos_theta: Array, phi: Array) -> Array:
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
