"""Float-texture kinds: IMAGE (luminance/alpha), VORONOI, ONE_MINUS, and the
texture-lerped MixedSurfaceMaterial path (reference textures.h:54-80,
MixedSurfaceMaterial in SurfaceMaterials/)."""
import jax.numpy as jnp
import numpy as np

from slr_tpu.scene.build import SceneBuilder
from slr_tpu.scene.textures import eval_float_texture


def _builder():
    b = SceneBuilder(spectral=False)
    return b


def _finish_min(b):
    """Attach a minimal mesh + camera so build() succeeds."""
    white = b.add_stex_const((1.0, 1.0, 1.0))
    mat = b.add_matte(white)
    tri = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    b.add_mesh(tri, np.tile([[0, 0, 1]], (3, 1)).astype(np.float32),
               np.tile([[1, 0, 0]], (3, 1)).astype(np.float32),
               np.zeros((3, 2), np.float32), np.array([[0, 1, 2]]), mat)
    b.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 1.0)
    return b.build()


def test_image_float_texture_lum_and_alpha():
    b = _builder()
    img = np.zeros((2, 2, 4), np.float32)
    img[..., 0] = 1.0   # R=1 -> lum = 0.2126
    img[..., 3] = 0.25  # alpha
    iid = b.add_image(img)
    t_lum = b.add_ftex_image(iid, "lum")
    t_alpha = b.add_ftex_image(iid, "alpha")
    scene = _finish_min(b)
    uv = jnp.zeros((2, 2), jnp.float32)
    ids = jnp.array([t_lum, t_alpha], jnp.int32)
    v = eval_float_texture(scene.ftex, ids, uv,
                           scene.stex.images, scene.stex.image_hw)
    np.testing.assert_allclose(np.asarray(v), [0.2126, 0.25], atol=1e-6)


def test_voronoi_float_texture_range_and_determinism():
    b = _builder()
    t = b.add_ftex_voronoi(0.5, value_scale=0.8)
    scene = _finish_min(b)
    uv = jnp.asarray(np.random.default_rng(0).uniform(0, 4, (64, 2)),
                     jnp.float32)
    ids = jnp.full((64,), t, jnp.int32)
    v = np.asarray(eval_float_texture(scene.ftex, ids, uv,
                                      scene.stex.images, scene.stex.image_hw))
    assert np.all(v >= 0.0) and np.all(v <= 0.8)
    assert len(np.unique(np.round(v, 5))) > 4  # cell-varying
    v2 = np.asarray(eval_float_texture(scene.ftex, ids, uv,
                                       scene.stex.images, scene.stex.image_hw))
    np.testing.assert_array_equal(v, v2)


def test_one_minus_complement():
    b = _builder()
    chk = b.add_ftex_checker(0.2, 0.9)
    inv = b.add_ftex_one_minus(chk)
    scene = _finish_min(b)
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 2, (32, 2)),
                     jnp.float32)
    a = np.asarray(eval_float_texture(scene.ftex, jnp.full((32,), chk), uv))
    c = np.asarray(eval_float_texture(scene.ftex, jnp.full((32,), inv), uv))
    np.testing.assert_allclose(a + c, 1.0, atol=1e-6)
    assert np.all(np.minimum(np.abs(a - 0.2), np.abs(a - 0.9)) < 1e-6)


def test_mixed_material_nonconst_ratio_builds_and_weights():
    """Mixed(m0, m1, checkerRatio): lobe weights are ratio / 1-ratio at shade
    time; total weight stays 1 so a white-furnace matte mix stays matte."""
    b = _builder()
    white = b.add_stex_const((1.0, 1.0, 1.0))
    gray = b.add_stex_const((0.5, 0.5, 0.5))
    m0 = b.add_matte(white)
    m1 = b.add_matte(gray)
    ratio = b.add_ftex_checker(1.0, 0.0)
    mixed = b.add_mixed(m0, m1, ratio)
    assert len(b.materials[mixed].lobes) == 2
    scene = _finish_min(b)

    from slr_tpu.bsdf.bsdf import gather_lobes

    uv = jnp.array([[0.1, 0.1], [0.6, 0.1]], jnp.float32)  # cells 0 / 1
    mat_id = jnp.full((2,), mixed, jnp.int32)
    lobes = gather_lobes(scene, mat_id, uv)
    # s0 already carries the ratio weight: cell A -> (white*1, gray*0),
    # cell B -> (white*0, gray*1).
    s0 = np.asarray(lobes.s0)
    np.testing.assert_allclose(s0[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(s0[0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(s0[1, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(s0[1, 1], 0.5, atol=1e-6)
