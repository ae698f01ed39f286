"""Flat SoA scene representation — the device-side scene format.

This is the TPU-native counterpart of the reference's render-time object tree
(libSLR/Core/SurfaceObject.{h,cpp}): where the reference flattens its authoring
scene graph into pointer-linked `SingleSurfaceObject`s + virtual BSDF closures,
we flatten into *arrays*. No polymorphism survives on device: every triangle
row carries a material index, materials are a struct-of-arrays of up to
MAX_LOBES weighted BSDF lobes (generalizing the reference's MultiBSDF,
libSLR/BSDFs/MultiBSDF.cpp:20-129), and textures are a tagged SoA table.

All classes are `flax.struct` pytrees: they trace through `jit`, shard with
`jax.sharding`, and differentiate (material/texture parameters are leaves).
"""
from __future__ import annotations

import enum
from typing import Any, Optional

import jax.numpy as jnp
from flax import struct

from ..core.math3d import Array
from ..core.sampling import Continuous2D, Discrete1D


MAX_LOBES = 4  # reference MultiBSDF holds at most 4 components (MultiBSDF.h)


class LobeKind(enum.IntEnum):
    """BSDF lobe tags. Each maps to one reference BSDF class (see bsdf/)."""

    NONE = 0
    LAMBERT = 1           # LambertianBRDF          (basic_BSDFs.cpp:12-57)
    OREN_NAYAR = 2        # OrenNayerBRDF           (OrenNayerBRDF.cpp)
    SPECULAR_REFLECTION = 3  # SpecularBRDF         (basic_BSDFs.cpp:61-91)
    SPECULAR_SCATTERING = 4  # SpecularBSDF (glass) (basic_BSDFs.cpp:95-169)
    MICROFACET_REFLECTION = 5  # MicrofacetBRDF     (MicrofacetBSDF.cpp)
    MICROFACET_SCATTERING = 6  # MicrofacetBSDF     (MicrofacetBSDF.cpp)
    WARD = 7              # ModifiedWardDurBRDF     (ModifiedWardDurBRDF.cpp)
    ASHIKHMIN = 8         # AshikhminShirleyBRDF: aniso Phong lobe + coupled
                          # diffuse with internal 2-component MIS
                          # (AshikhminShirleyBRDF.cpp:12-170)
    FLIPPED_LAMBERT = 10  # InverseBSDF(Lambert) for back-face emitters


class STexKind(enum.IntEnum):
    """Spectrum-texture tags (reference libSLR/Textures/*)."""

    CONST = 0
    IMAGE = 1
    CHECKER = 2
    VORONOI = 3
    CURVE = 4   # tabulated SPD (D65, IOR eta/k, ColorChecker patches)


class FTexKind(enum.IntEnum):
    CONST = 0
    IMAGE = 1      # image channel (value2 selects: 0 = luminance, 3 = alpha)
    CHECKER = 2
    VORONOI = 3
    ONE_MINUS = 4  # 1 - eval(source); source ftex id stored in image_id


class CameraKind(enum.IntEnum):
    PERSPECTIVE = 0   # reference PerspectiveCamera (thin lens)
    EQUIRECTANGULAR = 1


class SpectrumTextures(struct.PyTreeNode):
    """Tagged SoA table of spectrum textures.

    kind:      (C,) int32 STexKind
    value:     (C, S) primary color (CONST value / CHECKER color0); S = spectral dim
    value2:    (C, S) secondary color (CHECKER color1)
    image_id:  (C,) int32 index into `images` (-1 if unused)
    map_scale: (C, 2), map_offset: (C, 2) texcoord mapping (Texture2DMapping)
    images:    (NI, Hmax, Wmax, 4) stacked RGBA image atlas (possibly (0,...))
    image_hw:  (NI, 2) int32 actual (h, w) of each image
    """

    kind: Array
    value: Array
    value2: Array
    image_id: Array
    map_scale: Array
    map_offset: Array
    images: Array
    image_hw: Array
    # Spectral-mode extensions. In spectral scenes `value`/`value2` hold
    # Meng-Simon (u, v, scale) triples instead of RGB (the reference converts
    # RGB resources to uvs at load time, Image.h:24-25); tabulated SPDs live
    # in a padded curve table addressed by `curve_id`.
    curve_id: Array = None    # (C,) int32 into curves (-1 unused)
    # Curves are resampled at build onto a REGULAR per-nm grid over the
    # renderable range [WL_LO, WL_HI] (zeros outside the curve's native
    # domain): evaluation is index arithmetic + two flat gathers instead of a
    # per-lane searchsorted over padded irregular tables (which lowered to a
    # catastrophic (R, N, L) broadcast on TPU).
    curves_wl: Array = None   # (K, 2) native [min_wl, max_wl] per curve
    curves_v: Array = None    # (K, G) regular-grid values on [WL_LO, WL_HI]
    spectral: bool = struct.field(pytree_node=False, default=False)
    # Static feature flags: texture kinds present in this scene. jit omits
    # the evaluation code of absent kinds entirely (remote XLA compiles are
    # expensive; dead branches are not free to compile).
    has_checker: bool = struct.field(pytree_node=False, default=False)
    has_voronoi: bool = struct.field(pytree_node=False, default=False)
    has_curve: bool = struct.field(pytree_node=False, default=False)
    # Any CONST rows left in spectral mode? Build pre-tabulates constant
    # spectra into per-nm curves (exact: basis knots are 5nm), so spectral
    # scenes normally skip the whole Meng-Simon grid machinery at render
    # time; image/checker/voronoi textures still need it.
    has_const: bool = struct.field(pytree_node=False, default=True)


class FloatTextures(struct.PyTreeNode):
    kind: Array       # (F,) int32 FTexKind
    value: Array      # (F,) primary value / scale (IMAGE/VORONOI value scale)
    value2: Array     # (F,) CHECKER value1 / IMAGE channel / VORONOI cell scale
    image_id: Array   # (F,) image atlas id (IMAGE) or source ftex (ONE_MINUS)
    map_scale: Array  # (F, 2)
    map_offset: Array  # (F, 2)
    # Static feature flags — absent kinds compile to nothing (remote XLA
    # compiles are expensive; dead branches are not free).
    has_image: bool = struct.field(pytree_node=False, default=False)
    has_voronoi: bool = struct.field(pytree_node=False, default=False)
    has_one_minus: bool = struct.field(pytree_node=False, default=False)


class NTexKind(enum.IntEnum):
    IMAGE = 0     # tangent-space normal map (rgb*2-1)
    CHECKER = 1   # synthesized step edges (checker_board_textures.cpp:16-44)


class NormalTextures(struct.PyTreeNode):
    """Normal-map table (reference Normal3DTexture). Images index the shared
    stex atlas. step_width/reverse are the checker-normal parameters."""

    kind: Array        # (N,) int32 NTexKind
    image_id: Array    # (N,)
    step_width: Array  # (N,)
    reverse: Array     # (N,) 0/1
    map_scale: Array   # (N, 2)
    map_offset: Array  # (N, 2)


class Materials(struct.PyTreeNode):
    """Material table: every material is <= MAX_LOBES tagged lobes.

    lobe_kind:   (M, L) int32 LobeKind
    lobe_stex:   (M, L, 3) int32 spectrum-texture slots per lobe
                 slot meanings by kind:
                   LAMBERT/OREN_NAYAR: [reflectance, -, -]
                   SPECULAR_REFLECTION: [coeff, eta, k]        (conductor Fresnel)
                   SPECULAR_SCATTERING: [coeff, etaExt, etaInt] (dielectric)
                   MICROFACET_REFLECTION: [-, eta, k]
                   MICROFACET_SCATTERING: [-, etaExt, etaInt]
                   WARD/ASHIKHMIN_*: [reflectance, -, -]
    lobe_ftex:   (M, L, 2) int32 float-texture slots
                 [sigma, -] for OREN_NAYAR; [alpha_g, -] microfacet;
                 [anisoX, anisoY] WARD; [nu, nv] ASHIKHMIN_SPECULAR
    lobe_wtex:   (M, L) int32 float texture scaling the lobe (-1 => 1.0);
                 implements `createSurfaceMaterial("mix", ...)` ratios
    emit_stex:   (M,) int32 emittance spectrum texture (-1 => not emissive);
                 DiffuseEDF semantics (basic_EDFs.cpp:12-29)
    """

    lobe_kind: Array
    lobe_stex: Array
    lobe_ftex: Array
    lobe_wtex: Array
    emit_stex: Array

    @property
    def num(self) -> int:
        return self.lobe_kind.shape[0]


class Geometry(struct.PyTreeNode):
    """Triangle soup with baked static transforms (reference nodes.cpp:152-171
    bakes static transforms into render vertex buffers at build time).

    positions/normals/tangents: (V, 3); uvs: (V, 2)
    tri_vidx: (T, 3) int32; tri_mat: (T,) int32; tri_alpha: (T,) int32 ftex id
    """

    positions: Array
    normals: Array
    tangents: Array
    uvs: Array
    tri_vidx: Array
    tri_mat: Array
    tri_alpha: Array
    tri_ntex: Array = None  # (T,) int32 normal-texture id (-1 = none)
    # Packed per-triangle shading row (T, 40) f32 — every per-hit attribute
    # in ONE row so surface-point resolution is a single row gather instead
    # of ~15 scalar-core gathers (vertex indirection + per-attribute fetch).
    # Layout: see accel/intersect.py TRI_TABLE_COLS.
    tri_table: Array = None

    @property
    def num_tris(self) -> int:
        return self.tri_vidx.shape[0]


class Lights(struct.PyTreeNode):
    """Area-light table over emissive triangles + env-light bookkeeping,
    mirroring the reference's two-phase light selection: env-vs-area split by
    importance, then a discrete distribution over area lights
    (SurfaceObject.cpp:431-449, :226-250).

    tri_idx:  (NL,) int32 triangle ids (NL >= 1; dummy row if no area lights)
    dist:     Discrete1D over area lights (importance = power)
    env_prob: () probability of picking the env light (0 if none)
    """

    tri_idx: Array
    dist: Discrete1D
    env_prob: Array

    @property
    def num(self) -> int:
        return self.tri_idx.shape[0]


class EnvLight(struct.PyTreeNode):
    """Image-based environment light (reference InfiniteSphereSurfaceObject,
    SurfaceObject.cpp:137-209). `stex` indexes the scene's spectrum textures;
    `dist` is the (phi, theta) importance map; `scale` multiplies radiance."""

    stex: Array        # () int32, -1 => no env light
    dist: Continuous2D
    scale: Array       # ()


class Camera(struct.PyTreeNode):
    """Reference PerspectiveCamera (thin lens; PerspectiveCamera.cpp:15-99) or
    EquirectangularCamera. `kind` is static metadata."""

    kind: int = struct.field(pytree_node=False, default=CameraKind.PERSPECTIVE)
    to_world: Array = None     # (4, 4) camera-to-world
    aspect: Array = None       # ()
    fovy: Array = None         # ()
    lens_radius: Array = None  # ()
    img_dist: Array = None     # () imgPlaneDistance
    obj_dist: Array = None     # () focus distance
    phi_angle: Array = None    # () equirect horizontal angle
    theta_angle: Array = None  # () equirect vertical angle


class BVH(struct.PyTreeNode):
    """Flat LBVH (built in accel/lbvh.py).

    node_min/node_max: (N, 3) child AABBs; node_left/node_right: (N,) int32
    child pointers — negative values encode leaf: prim = -(ptr) - 1.
    Interior nodes reference either nodes (>=0) or single-primitive leaves.
    prim_order: (T,) int32 primitive reordering.
    """

    node_min: Array
    node_max: Array
    node_left: Array
    node_right: Array
    prim_order: Array


class Instances(struct.PyTreeNode):
    """Two-level acceleration for instancing and motion blur.

    Replaces the reference's TransformedSurfaceObject wrappers +
    Intersection object stack (SurfaceObject.cpp:307-336): instanced /
    animated subtrees become shared BLASes (node arena over local-space
    triangles) plus per-instance rows carrying the shutter-begin/end TRS
    decomposition (AnimatedTransform, Transform.h:89-143). A TLAS over
    per-instance *motion bounds* (motionBounds, Transform.h) culls at the
    top level; traversal is dual-stack lock-step (accel/twolevel.py).

    TLAS: binary BVH whose leaves are instance ids (tlas_prim). Interior
    child AABBs in tlas_min/max; leaf-child AABBs come from inst_bmin/bmax.
    BLAS arena: concatenated per-BLAS node arrays; child pointers are
    arena-absolute; leaves encode -(slot)-1 into blas_prim (global tri ids).
    Instanced triangles live at the TAIL of Geometry in LOCAL space; the
    static accelerators only cover the [0, n_static) prefix.
    """

    tlas_min: Array    # (NT, 3)
    tlas_max: Array    # (NT, 3)
    tlas_left: Array   # (NT,)
    tlas_right: Array  # (NT,)
    tlas_prim: Array   # (LT,) -> instance id
    inst_bmin: Array   # (I, 3) motion bounds
    inst_bmax: Array   # (I, 3)
    blas_min: Array    # (NB, 3)
    blas_max: Array    # (NB, 3)
    blas_left: Array   # (NB,)
    blas_right: Array  # (NB,)
    blas_prim: Array   # (PB,) -> global triangle id
    blas_root: Array   # (I,) arena node id (or leaf encoding for 1-tri BLAS)
    t0_T: Array        # (I, 3) translation at shutter begin
    t0_R: Array        # (I, 4) rotation quat [x,y,z,w]
    t0_S: Array        # (I, 3) scale
    t1_T: Array        # (I, 3) ... at shutter end
    t1_R: Array        # (I, 4)
    t1_S: Array        # (I, 3)

    @property
    def num(self) -> int:
        return self.blas_root.shape[0]


class FlatScene(struct.PyTreeNode):
    """The complete device-side scene. Counterpart of SLR::Scene
    (SurfaceObject.h:239-260) after `Scene::build` flattening."""

    geometry: Geometry
    materials: Materials
    stex: SpectrumTextures
    ftex: FloatTextures
    lights: Lights
    env: EnvLight
    camera: Camera
    bvh: Optional[BVH] = None
    plucker: Optional[Any] = None  # accel.plucker.PluckerTris (MXU intersector)
    pallas_tris: Optional[Any] = None  # accel.pallas_intersect.PallasTris
    ntex: Optional[NormalTextures] = None
    instances: Optional[Instances] = None  # two-level path (motion/instancing)
    n_static: int = struct.field(pytree_node=False, default=-1)  # static tris
    # Static set of LobeKind ints occurring in `materials`; the BSDF
    # dispatchers compile only these kinds (None = all).
    lobe_kinds_present: Optional[tuple] = struct.field(
        pytree_node=False, default=None
    )
    has_env: bool = struct.field(pytree_node=False, default=False)
    has_normal_map: bool = struct.field(pytree_node=False, default=False)
    has_alpha: bool = struct.field(pytree_node=False, default=False)
    # Static (NS*8,) f32 bytes of accel.pallas_intersect.build_super_boxes —
    # coarse entry-group AABBs for the wavefront's contact-point sort key.
    # Static on purpose: as a traced pytree leaf the extra argument
    # measurably degraded XLA's compile of the BPT program; as bytes it
    # materializes as an XLA constant only where used (pt._ray_sort_key).
    super_boxes_blob: Optional[bytes] = struct.field(
        pytree_node=False, default=None
    )
    world_center: Array = None  # (3,)
    world_radius: Array = None  # ()
