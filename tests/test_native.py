"""Native C++ SBVH builder tests (slr_tpu/native/sbvh.cc).

The builder reimplements the reference's default accelerator — binned object
SAH + Stich2009 spatial splits (libSLR/Accelerator/SBVH.h:57-348) — as a
host-side flat-array producer for the device lock-step traversal. Oracles:
structural invariants on random soups, and closest-hit agreement with the
brute-force intersector.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from slr_tpu.native import get_lib, sbvh_build
from slr_tpu.accel.lbvh import build_bvh, intersect_bvh
from slr_tpu.accel.intersect import intersect_brute
from slr_tpu.scene.types import Geometry


def _soup(T, seed=0):
    rng = np.random.RandomState(seed)
    c = rng.rand(T, 3).astype(np.float32) * 10
    p0 = c + rng.randn(T, 3).astype(np.float32) * 0.3
    p1 = c + rng.randn(T, 3).astype(np.float32) * 0.3
    p2 = c + rng.randn(T, 3).astype(np.float32) * 0.3
    return p0, p1, p2


@pytest.fixture(scope="module")
def native_available():
    if get_lib() is None:
        pytest.skip("native toolchain unavailable")


def test_structure_invariants(native_available):
    T = 400
    p0, p1, p2 = _soup(T)
    res = sbvh_build(p0, p1, p2)
    assert res is not None
    # Every triangle reachable; every leaf slot referenced exactly once;
    # every interior node referenced exactly once except the root.
    assert set(res.prim_order.tolist()) == set(range(T))
    ptr = np.concatenate([res.node_left, res.node_right])
    leaves = -(ptr[ptr < 0]) - 1
    assert leaves.min() >= 0 and leaves.max() < res.n_refs
    assert (np.bincount(leaves, minlength=res.n_refs) == 1).all()
    interior = ptr[ptr >= 0]
    cnt = np.bincount(interior, minlength=res.n_nodes)
    assert cnt[0] == 0 and (cnt[1:] == 1).all()
    assert res.n_nodes == res.n_refs - 1  # binary tree, single-prim leaves


def test_spatial_splits_duplicate_refs(native_available):
    # Long skinny diagonal triangles overlap heavily: spatial splits fire.
    T = 64
    rng = np.random.RandomState(3)
    a = rng.rand(T, 3).astype(np.float32)
    p0 = a
    p1 = a + np.float32([4.0, 0.05, 0.05])
    p2 = a + np.float32([4.0, 0.1, 0.0])
    res = sbvh_build(p0, p1, p2)
    assert res.n_refs > T  # duplication happened
    assert set(res.prim_order.tolist()) == set(range(T))


def test_budget_never_drops_primitives(native_available):
    T = 128
    p0, p1, p2 = _soup(T, seed=5)
    # Tiny budget: spatial splits mostly declined, but tree stays complete.
    res = sbvh_build(p0, p1, p2, budget=1.0)
    assert res is not None
    assert set(res.prim_order.tolist()) == set(range(T))
    assert res.n_refs == T


def test_traversal_matches_brute_force(native_available):
    T = 300
    p0, p1, p2 = _soup(T, seed=7)
    positions = np.concatenate([p0, p1, p2], axis=0).astype(np.float32)
    tri_vidx = np.stack(
        [np.arange(T), np.arange(T) + T, np.arange(T) + 2 * T], axis=1
    ).astype(np.int32)
    geom = Geometry(
        positions=jnp.asarray(positions),
        normals=jnp.zeros_like(jnp.asarray(positions)),
        tangents=jnp.zeros_like(jnp.asarray(positions)),
        uvs=jnp.zeros((positions.shape[0], 2), jnp.float32),
        tri_vidx=jnp.asarray(tri_vidx),
        tri_mat=jnp.zeros((T,), jnp.int32),
        tri_alpha=jnp.full((T,), -1, jnp.int32),
        tri_ntex=jnp.full((T,), -1, jnp.int32),
    )
    bvh = build_bvh(positions, tri_vidx, method="sbvh")
    rng = np.random.RandomState(11)
    R = 1024
    o = jnp.asarray(rng.rand(R, 3).astype(np.float32) * 10)
    d = rng.randn(R, 3).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    hb = intersect_brute(geom, o, d)
    ht = intersect_bvh(geom, bvh, o, d)
    mb, mt = np.asarray(hb.mask), np.asarray(ht.mask)
    assert (mb == mt).mean() > 0.999
    both = mb & mt
    assert np.allclose(
        np.asarray(hb.t)[both], np.asarray(ht.t)[both], rtol=1e-4, atol=1e-5
    )


def test_per_primitive_cost_model():
    """SBVH.h's per-primitive costForIntersect in the SAH (r2/r3 trivia):
    a cost table biases splits — a subtree of expensive prims gets
    isolated earlier, and the reported SAH cost scales with it."""
    import numpy as np
    from slr_tpu.native import sbvh_build

    rs = np.random.RandomState(0)
    n = 256
    c = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    p0 = c
    p1 = c + rs.uniform(0.01, 0.05, (n, 3)).astype(np.float32)
    p2 = c + rs.uniform(0.01, 0.05, (n, 3)).astype(np.float32)
    uniform = sbvh_build(p0, p1, p2)
    if uniform is None:
        import pytest
        pytest.skip("native sbvh unavailable")
    cost = np.full((n,), 1.0, np.float32)
    cost[:32] = 50.0
    weighted = sbvh_build(p0, p1, p2, prim_cost=cost)
    assert weighted is not None
    assert weighted.sah_cost > uniform.sah_cost * 1.4
    # explicit uniform table == default
    unit = sbvh_build(p0, p1, p2, prim_cost=np.full((n,), 1.0, np.float32))
    assert abs(unit.sah_cost - uniform.sah_cost) < 1e-3 * uniform.sah_cost
