"""Host-side scene builder: authoring API -> FlatScene device arrays.

Counterpart of the reference's build phase: libSLRSceneGraph nodes flattening
into libSLR render objects (nodes.cpp:110-184, Scene.cpp:28-41). Static
transforms are baked into vertex buffers exactly as the reference does
(nodes.cpp:152-171); emissive triangles become the light table with uniform
importance per light (SingleSurfaceObject::importance == 1, SurfaceObject.cpp
:69-71). The scene-graph front end (scene/graph.py) and the DSL interpreter
drive this builder.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..core.sampling import build_continuous_2d, build_discrete_1d
from .types import (
    BVH,
    Camera,
    CameraKind,
    EnvLight,
    FlatScene,
    FloatTextures,
    FTexKind,
    Geometry,
    Lights,
    LobeKind,
    Materials,
    MAX_LOBES,
    STexKind,
    SpectrumTextures,
)


@dataclasses.dataclass
class _STex:
    kind: int
    value: np.ndarray          # (S,) RGB — or (3,) Meng-Simon uvs in spectral mode
    value2: np.ndarray         # (S,)
    image_id: int = -1
    map_scale: tuple = (1.0, 1.0)
    map_offset: tuple = (0.0, 0.0)
    curve_id: int = -1


@dataclasses.dataclass
class _FTex:
    kind: int
    value: float = 0.0
    value2: float = 0.0
    image_id: int = -1
    map_scale: tuple = (1.0, 1.0)
    map_offset: tuple = (0.0, 0.0)


@dataclasses.dataclass
class _Lobe:
    kind: int
    stex: tuple = (-1, -1, -1)
    ftex: tuple = (-1, -1)
    wtex: int = -1


@dataclasses.dataclass
class _Material:
    lobes: list
    emit_stex: int = -1


class SceneBuilder:
    """Accumulates host-side scene data, then `build()`s the device pytree."""

    def __init__(self, spectral_dim: int = 3, spectral: bool = False):
        self.spectral = spectral
        self.s = 3 if spectral else spectral_dim
        self.curves: list[tuple[np.ndarray, np.ndarray]] = []
        self.stex: list[_STex] = []
        self.ftex: list[_FTex] = []
        self.images: list[np.ndarray] = []
        self.materials: list[_Material] = []
        self.positions: list[np.ndarray] = []
        self.normals: list[np.ndarray] = []
        self.tangents: list[np.ndarray] = []
        self.uvs: list[np.ndarray] = []
        self.tri_vidx: list[np.ndarray] = []
        self.tri_mat: list[np.ndarray] = []
        self.tri_alpha: list[np.ndarray] = []
        self.tri_ntex: list[np.ndarray] = []
        self.ntex: list[dict] = []
        self._nverts = 0
        self.camera: Optional[Camera] = None
        self.env_stex: int = -1
        self.env_scale: float = 1.0
        # Two-level path: per-BLAS mesh buffers (local space) + instance rows.
        self._blas: list[dict] = []
        self._cur_blas: Optional[dict] = None
        self.instance_rows: list[tuple[int, np.ndarray, np.ndarray]] = []

    # -- textures -----------------------------------------------------------
    def _spec(self, v, illuminant: bool = False) -> np.ndarray:
        a = np.asarray(v, np.float32).reshape(-1)
        if a.size == 1:
            a = np.full((3,), a[0], np.float32)
        assert a.size == self.s, f"expected spectrum dim {self.s}, got {a.size}"
        if self.spectral:
            return self._rgb_to_uvs(a, illuminant)
        return a

    @staticmethod
    def _rgb_to_uvs(rgb: np.ndarray, illuminant: bool) -> np.ndarray:
        """Host-side Upsampling::sRGB_to_uvs (Spectrum.h:148-170) with the
        reflectance EqualEnergyReflectance normalization applied (so a (1,1,1)
        reflectance evaluates to a flat spectrum of 1)."""
        from ..spectrum.spectral import _sRGB_E_to_XYZ, _sRGB_to_XYZ, upsampling_tables

        m = _sRGB_to_XYZ if illuminant else _sRGB_E_to_XYZ
        xyz = m @ rgb.astype(np.float32)
        b = float(xyz.sum())
        if b == 0:
            xy = np.array([1 / 3, 1 / 3], np.float32)
        else:
            xy = (xyz[:2] / b).astype(np.float32)
        u = 16.730260708356887 * xy[0] + 7.7801960340706 * xy[1] - 2.170152247475828
        v = -7.530081094743006 * xy[0] + 16.192422314095225 * xy[1] + 1.1125529268825947
        scale = b if illuminant else b / upsampling_tables()["eer"]
        return np.array([u, v, scale], np.float32)

    def add_stex_const(self, value, illuminant: bool = False) -> int:
        self.stex.append(
            _STex(STexKind.CONST, self._spec(value, illuminant),
                  np.zeros(self.s, np.float32))
        )
        return len(self.stex) - 1

    def add_curve(self, wls, values) -> int:
        """Register a tabulated SPD (wavelengths nm ascending + values)."""
        self.curves.append(
            (np.asarray(wls, np.float32), np.asarray(values, np.float32))
        )
        return len(self.curves) - 1

    def add_stex_curve(self, curve_id: int, scale: float = 1.0) -> int:
        v = np.zeros(self.s, np.float32)
        v[0] = scale
        self.stex.append(
            _STex(STexKind.CURVE, v, np.zeros(self.s, np.float32),
                  curve_id=curve_id)
        )
        return len(self.stex) - 1

    def add_stex_d65(self, scale: float = 1.0) -> int:
        """Spectrum("ID": "D65") (API.cpp:286-441)."""
        from ..spectrum.spectral import _raw

        d = _raw("cie.npz")
        wls = np.linspace(300.0, 830.0, d["d65"].shape[0])
        return self.add_stex_curve(self.add_curve(wls, d["d65"]), scale)

    def add_stex_ior(self, name: str, component: int = 0, scale: float = 1.0) -> int:
        """Spectrum("ID": name, comp): measured eta (0) / k (1) curves
        (spectrum_library.cpp SpectrumLibrary::IORs)."""
        from ..spectrum.spectral import ior_spectrum

        lambdas, etas, ks = ior_spectrum(name)
        vals = etas if component == 0 else ks
        return self.add_stex_curve(self.add_curve(lambdas, vals), scale)

    def add_stex_colorchecker(self, patch: int, scale: float = 1.0) -> int:
        from ..spectrum.spectral import _raw

        d = _raw("cie.npz")
        wls = np.linspace(380.0, 730.0, 36)
        return self.add_stex_curve(
            self.add_curve(wls, d["colorchecker"][patch]), scale
        )

    def add_stex_checker(self, v0, v1, map_scale=(1, 1), map_offset=(0, 0)) -> int:
        self.stex.append(
            _STex(STexKind.CHECKER, self._spec(v0), self._spec(v1),
                  map_scale=tuple(map_scale), map_offset=tuple(map_offset))
        )
        return len(self.stex) - 1

    def add_stex_voronoi(self, scale: float, brightness: float = 0.8) -> int:
        v = np.zeros(self.s, np.float32)
        v[0] = scale
        v2 = np.zeros(self.s, np.float32)
        v2[0] = brightness
        self.stex.append(_STex(STexKind.VORONOI, v, v2))
        return len(self.stex) - 1

    def add_image(self, img: np.ndarray) -> int:
        """img: (H, W, 3|4) float32 linear."""
        img = np.asarray(img, np.float32)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        self.images.append(img)
        return len(self.images) - 1

    def add_stex_image(self, image_id: int, scale=1.0, map_scale=(1, 1),
                       map_offset=(0, 0)) -> int:
        self.stex.append(
            _STex(STexKind.IMAGE, self._spec(scale), np.zeros(self.s, np.float32),
                  image_id=image_id, map_scale=tuple(map_scale),
                  map_offset=tuple(map_offset))
        )
        return len(self.stex) - 1

    def add_ntex_image(self, image_id: int, map_scale=(1, 1),
                       map_offset=(0, 0)) -> int:
        self.ntex.append({
            "kind": 0, "image_id": image_id, "step_width": 1.0, "reverse": 0.0,
            "map_scale": tuple(map_scale), "map_offset": tuple(map_offset),
        })
        return len(self.ntex) - 1

    def add_ntex_checker(self, step_width: float = 0.05, reverse: bool = False,
                         map_scale=(1, 1), map_offset=(0, 0)) -> int:
        self.ntex.append({
            "kind": 1, "image_id": -1, "step_width": float(step_width),
            "reverse": 1.0 if reverse else 0.0,
            "map_scale": tuple(map_scale), "map_offset": tuple(map_offset),
        })
        return len(self.ntex) - 1

    def add_ftex_const(self, value: float) -> int:
        self.ftex.append(_FTex(FTexKind.CONST, float(value)))
        return len(self.ftex) - 1

    def add_ftex_checker(self, v0: float, v1: float, map_scale=(1, 1),
                         map_offset=(0, 0)) -> int:
        self.ftex.append(
            _FTex(FTexKind.CHECKER, float(v0), float(v1),
                  map_scale=tuple(map_scale), map_offset=tuple(map_offset))
        )
        return len(self.ftex) - 1

    def add_ftex_image(self, image_id: int, channel: str = "lum",
                       scale: float = 1.0, map_scale=(1, 1),
                       map_offset=(0, 0)) -> int:
        """Image float texture (ImageFloatTexture / AlphaTexture mode,
        image_textures.cpp). channel: 'lum' or 'alpha'."""
        chan = 3.0 if channel == "alpha" else 0.0
        self.ftex.append(
            _FTex(FTexKind.IMAGE, float(scale), chan, image_id=image_id,
                  map_scale=tuple(map_scale), map_offset=tuple(map_offset))
        )
        return len(self.ftex) - 1

    def add_ftex_voronoi(self, scale: float, value_scale: float = 1.0) -> int:
        """VoronoiFloatTexture (voronoi_textures.cpp): per-cell random value
        in [0, value_scale); `scale` is the cell size."""
        self.ftex.append(_FTex(FTexKind.VORONOI, float(value_scale),
                               float(scale)))
        return len(self.ftex) - 1

    def add_ftex_one_minus(self, src_ftex: int) -> int:
        """Complement texture 1 - src (MixedSurfaceMaterial's second arm)."""
        self.ftex.append(_FTex(FTexKind.ONE_MINUS, image_id=src_ftex))
        return len(self.ftex) - 1

    # -- materials ----------------------------------------------------------
    def _add_material(self, lobes: list, emit_stex: int = -1) -> int:
        assert len(lobes) <= MAX_LOBES
        self.materials.append(_Material(lobes=lobes, emit_stex=emit_stex))
        return len(self.materials) - 1

    def add_matte(self, reflectance_stex: int, sigma_ftex: int = -1) -> int:
        """reference createSurfaceMaterial("matte", ...) API.cpp:472-640."""
        if sigma_ftex >= 0:
            lobe = _Lobe(LobeKind.OREN_NAYAR, (reflectance_stex, -1, -1),
                         (sigma_ftex, -1))
        else:
            lobe = _Lobe(LobeKind.LAMBERT, (reflectance_stex, -1, -1))
        return self._add_material([lobe])

    def add_inverse(self, base_mat: int) -> int:
        """createSurfaceMaterial("inverse", ...): flip the base material's
        scattering hemisphere (InverseBSDF, basic_BSDFs.cpp:173-207).
        Supported for diffuse bases (the reference scenes' two-sided
        sum(matte, inverse(matte)) idiom)."""
        flip = {
            int(LobeKind.LAMBERT): LobeKind.FLIPPED_LAMBERT,
            int(LobeKind.OREN_NAYAR): LobeKind.FLIPPED_LAMBERT,
        }
        lobes = []
        for lb in self.materials[base_mat].lobes:
            if int(lb.kind) not in flip:
                raise NotImplementedError(
                    f"inverse of lobe kind {LobeKind(lb.kind).name} "
                    "is not supported"
                )
            lobes.append(dataclasses.replace(lb, kind=flip[int(lb.kind)]))
        return self._add_material(lobes)

    def add_metal(self, coeff_stex: int, eta_stex: int, k_stex: int) -> int:
        return self._add_material(
            [_Lobe(LobeKind.SPECULAR_REFLECTION, (coeff_stex, eta_stex, k_stex))]
        )

    def add_glass(self, coeff_stex: int, eta_ext_stex: int, eta_int_stex: int) -> int:
        return self._add_material(
            [_Lobe(LobeKind.SPECULAR_SCATTERING,
                   (coeff_stex, eta_ext_stex, eta_int_stex))]
        )

    def add_microfacet_metal(self, eta_stex: int, k_stex: int, alpha_ftex: int) -> int:
        return self._add_material(
            [_Lobe(LobeKind.MICROFACET_REFLECTION, (-1, eta_stex, k_stex),
                   (alpha_ftex, -1))]
        )

    def add_microfacet_glass(self, eta_ext_stex: int, eta_int_stex: int,
                             alpha_ftex: int) -> int:
        return self._add_material(
            [_Lobe(LobeKind.MICROFACET_SCATTERING, (-1, eta_ext_stex, eta_int_stex),
                   (alpha_ftex, -1))]
        )

    def add_ward(self, reflectance_stex: int, ax_ftex: int, ay_ftex: int) -> int:
        return self._add_material(
            [_Lobe(LobeKind.WARD, (reflectance_stex, -1, -1), (ax_ftex, ay_ftex))]
        )

    def add_ashikhmin(self, rs_stex: int, rd_stex: int, nu_ftex: int,
                      nv_ftex: int) -> int:
        return self._add_material(
            [_Lobe(LobeKind.ASHIKHMIN, (rs_stex, rd_stex, -1), (nu_ftex, nv_ftex))]
        )

    def add_mixed(self, mat0: int, mat1: int, ratio_ftex: int) -> int:
        """MixedSurfaceMaterial: mat0 * ratio + mat1 * (1 - ratio).

        Requires an inverted ratio texture for mat1; the caller provides
        `ratio_ftex` evaluated for mat0 and we synthesize the complement via a
        second float texture when ratio is constant."""
        m0 = self.materials[mat0]
        m1 = self.materials[mat1]
        lobes = []
        for lb in m0.lobes:
            lobes.append(dataclasses.replace(lb, wtex=ratio_ftex))
        # complement ratio texture: const folds at build time, anything else
        # evaluates as 1 - ratio(uv) at shade time (reference lerps with the
        # FloatTexture itself, MixedSurfaceMaterial).
        src = self.ftex[ratio_ftex]
        if src.kind == FTexKind.CONST:
            inv = self.add_ftex_const(1.0 - src.value)
        else:
            inv = self.add_ftex_one_minus(ratio_ftex)
        for lb in m1.lobes:
            lobes.append(dataclasses.replace(lb, wtex=inv))
        return self._add_material(lobes)

    def add_summed(self, mat0: int, mat1: int) -> int:
        m0 = self.materials[mat0]
        m1 = self.materials[mat1]
        emit = max(m0.emit_stex, m1.emit_stex)
        return self._add_material(list(m0.lobes) + list(m1.lobes), emit_stex=emit)

    def add_emitter(self, scatter_mat: int, emit_stex: int) -> int:
        """EmitterSurfaceMaterial = scattering material + emitter property."""
        m = self.materials[scatter_mat]
        return self._add_material(list(m.lobes), emit_stex=emit_stex)

    # -- geometry -----------------------------------------------------------
    def add_mesh(
        self,
        positions: np.ndarray,
        normals: np.ndarray,
        tangents: np.ndarray,
        uvs: np.ndarray,
        tri_vidx: np.ndarray,
        mat_id: int | np.ndarray,
        transform: Optional[np.ndarray] = None,
        alpha_ftex: int = -1,
        normal_ntex: int = -1,
    ) -> None:
        """Append a triangle mesh; bakes `transform` (4x4) into the vertices."""
        positions = np.asarray(positions, np.float32).reshape(-1, 3)
        normals = np.asarray(normals, np.float32).reshape(-1, 3)
        tangents = np.asarray(tangents, np.float32).reshape(-1, 3)
        uvs = np.asarray(uvs, np.float32).reshape(-1, 2)
        tri_vidx = np.asarray(tri_vidx, np.int32).reshape(-1, 3)
        if transform is not None:
            m = np.asarray(transform, np.float32)
            positions = positions @ m[:3, :3].T + m[:3, 3]
            inv = np.linalg.inv(m[:3, :3])
            normals = normals @ inv  # inverse-transpose
            norms = np.linalg.norm(normals, axis=-1, keepdims=True)
            normals = normals / np.maximum(norms, 1e-20)
            tangents = tangents @ m[:3, :3].T
            tnorms = np.linalg.norm(tangents, axis=-1, keepdims=True)
            tangents = tangents / np.maximum(tnorms, 1e-20)
        n_tris = tri_vidx.shape[0]
        mat = np.broadcast_to(np.asarray(mat_id, np.int32), (n_tris,))
        if self._cur_blas is not None:
            b = self._cur_blas
            b["positions"].append(positions)
            b["normals"].append(normals)
            b["tangents"].append(tangents)
            b["uvs"].append(uvs)
            b["tri_vidx"].append(tri_vidx + b["nverts"])
            b["tri_mat"].append(mat.copy())
            b["tri_alpha"].append(np.full((n_tris,), alpha_ftex, np.int32))
            b["tri_ntex"].append(np.full((n_tris,), normal_ntex, np.int32))
            b["nverts"] += positions.shape[0]
            return
        self.positions.append(positions)
        self.normals.append(normals)
        self.tangents.append(tangents)
        self.uvs.append(uvs)
        self.tri_vidx.append(tri_vidx + self._nverts)
        self.tri_mat.append(mat.copy())
        self.tri_alpha.append(np.full((n_tris,), alpha_ftex, np.int32))
        self.tri_ntex.append(np.full((n_tris,), normal_ntex, np.int32))
        self._nverts += positions.shape[0]

    # -- instancing / motion blur (two-level path) ---------------------------

    def begin_blas(self) -> int:
        """Start recording a shared BLAS: subsequent add_mesh calls append
        LOCAL-space geometry to it until end_blas(). The analogue of
        ReferenceNode building its subtree's aggregate once (nodes.cpp:
        174-184)."""
        assert self._cur_blas is None, "nested BLAS recording"
        self._cur_blas = {
            "positions": [], "normals": [], "tangents": [], "uvs": [],
            "tri_vidx": [], "tri_mat": [], "tri_alpha": [], "tri_ntex": [],
            "nverts": 0,
        }
        self._blas.append(self._cur_blas)
        return len(self._blas) - 1

    def end_blas(self) -> None:
        assert self._cur_blas is not None
        assert self._cur_blas["positions"], "BLAS recorded no geometry"
        self._cur_blas = None

    def add_instance(self, blas_id: int, m_begin: np.ndarray,
                     m_end: Optional[np.ndarray] = None) -> None:
        """Instance a recorded BLAS with world transforms at the shutter
        endpoints (equal or m_end=None for a static instance) — the analogue
        of one TransformedSurfaceObject wrapper (SurfaceObject.cpp:307-336)."""
        m0 = np.asarray(m_begin, np.float32)
        m1 = m0 if m_end is None else np.asarray(m_end, np.float32)
        self.instance_rows.append((blas_id, m0, m1))

    # -- camera / environment ----------------------------------------------
    def set_camera_perspective(self, to_world: np.ndarray, aspect: float,
                               fovy: float, lens_radius: float = 0.0,
                               img_dist: float = 1.0, obj_dist: float = 1.0) -> None:
        self.camera = Camera(
            kind=CameraKind.PERSPECTIVE,
            to_world=jnp.asarray(to_world, jnp.float32),
            aspect=jnp.float32(aspect),
            fovy=jnp.float32(fovy),
            lens_radius=jnp.float32(lens_radius),
            img_dist=jnp.float32(img_dist),
            obj_dist=jnp.float32(obj_dist),
            phi_angle=jnp.float32(2 * np.pi),
            theta_angle=jnp.float32(np.pi),
        )

    def set_camera_equirect(self, to_world: np.ndarray,
                            phi_angle: float = 2 * np.pi,
                            theta_angle: float = np.pi) -> None:
        """EquirectangularCamera (EquirectangularCamera.cpp:28-91)."""
        self.camera = Camera(
            kind=CameraKind.EQUIRECTANGULAR,
            to_world=jnp.asarray(to_world, jnp.float32),
            aspect=jnp.float32(1.0),
            fovy=jnp.float32(1.0),
            lens_radius=jnp.float32(0.0),
            img_dist=jnp.float32(1.0),
            obj_dist=jnp.float32(1.0),
            phi_angle=jnp.float32(phi_angle),
            theta_angle=jnp.float32(theta_angle),
        )

    def set_environment(self, stex_id: int, scale: float = 1.0) -> None:
        self.env_stex = stex_id
        self.env_scale = float(scale)

    # -- build --------------------------------------------------------------
    def build(self, use_bvh: bool = True,
              flatten_static_instances: bool = True,
              flatten_budget: int = 4_000_000) -> FlatScene:
        s = self.s
        if self.camera is None:
            self.set_camera_perspective(np.eye(4, dtype=np.float32), 1.0, 0.52)
        assert self.positions or self._blas, "scene has no geometry"

        # Local copies: build() never mutates the builder's recorded lists.
        st_positions = list(self.positions)
        st_normals = list(self.normals)
        st_tangents = list(self.tangents)
        st_uvs = list(self.uvs)
        st_tri_vidx = list(self.tri_vidx)
        st_tri_mat = list(self.tri_mat)
        st_tri_alpha = list(self.tri_alpha)
        st_tri_ntex = list(self.tri_ntex)
        nverts = self._nverts
        inst_rows = list(self.instance_rows)

        # Static-instance flattening: instances whose shutter-begin/end
        # transforms agree are baked into WORLD-space static geometry so they
        # ride the SBVH treelet chunks (O(log n)-class culled traversal)
        # instead of one worklist entry per instance. This is the reference's
        # own semantics for static transforms — nodes.cpp:110-171 bakes
        # static TFs into vertex buffers at flatten; only animated/instanced
        # transforms keep TransformedSurfaceObject wrappers. HBM makes the
        # memory trade trivial where the reference's RAM did not.
        if flatten_static_instances and inst_rows:
            n_flat = sum(
                sum(t.shape[0] for t in self._blas[bid]["tri_vidx"])
                for bid, m0, m1 in inst_rows if np.array_equal(m0, m1)
            )
            if n_flat <= flatten_budget:
                blas_cat: dict[int, tuple] = {}
                kept = []
                for bid, m0, m1 in inst_rows:
                    if not np.array_equal(m0, m1):
                        kept.append((bid, m0, m1))
                        continue
                    if bid not in blas_cat:
                        b = self._blas[bid]
                        blas_cat[bid] = tuple(
                            np.concatenate(b[k]) for k in (
                                "positions", "normals", "tangents", "uvs",
                                "tri_vidx", "tri_mat", "tri_alpha",
                                "tri_ntex")
                        )
                    bp, bn, bt, bu, bv, bm, ba, bx = blas_cat[bid]
                    lin = m0[:3, :3]
                    p = bp @ lin.T + m0[:3, 3]
                    nn = bn @ np.linalg.inv(lin)  # inverse-transpose
                    nn = nn / np.maximum(
                        np.linalg.norm(nn, axis=-1, keepdims=True), 1e-20)
                    tt = bt @ lin.T
                    tt = tt / np.maximum(
                        np.linalg.norm(tt, axis=-1, keepdims=True), 1e-20)
                    st_positions.append(p.astype(np.float32))
                    st_normals.append(nn.astype(np.float32))
                    st_tangents.append(tt.astype(np.float32))
                    st_uvs.append(bu)
                    st_tri_vidx.append(bv + nverts)
                    st_tri_mat.append(bm)
                    st_tri_alpha.append(ba)
                    st_tri_ntex.append(bx)
                    nverts += p.shape[0]
                inst_rows = kept

        if not st_positions:
            # Fully-instanced scene: keep a degenerate (never-hit) static
            # triangle so the static prefix and its accelerators stay valid.
            st_positions.append(np.full((3, 3), 1e30, np.float32))
            st_normals.append(np.tile(np.float32([0, 1, 0]), (3, 1)))
            st_tangents.append(np.tile(np.float32([1, 0, 0]), (3, 1)))
            st_uvs.append(np.zeros((3, 2), np.float32))
            st_tri_vidx.append(np.asarray([[0, 1, 2]], np.int32) + nverts)
            st_tri_mat.append(np.zeros((1,), np.int32))
            st_tri_alpha.append(np.full((1,), -1, np.int32))
            st_tri_ntex.append(np.full((1,), -1, np.int32))
            nverts += 3
        positions = np.concatenate(st_positions)
        normals = np.concatenate(st_normals)
        tangents = np.concatenate(st_tangents)
        uvs = np.concatenate(st_uvs)
        tri_vidx = np.concatenate(st_tri_vidx)
        tri_mat = np.concatenate(st_tri_mat)
        tri_alpha = np.concatenate(st_tri_alpha)
        tri_ntex = np.concatenate(st_tri_ntex)
        n_static = tri_vidx.shape[0]

        # Append BLAS geometry (local space) after the static prefix; the
        # static accelerators below only cover [0, n_static). Skipped when
        # flattening left no live instances.
        blas_ranges: list[tuple[int, int]] = []
        if self._blas and inst_rows:
            assert self._cur_blas is None, "unterminated BLAS recording"
            voff = positions.shape[0]
            toff = n_static
            parts_p, parts_n, parts_t, parts_u = [], [], [], []
            parts_v, parts_m, parts_a, parts_x = [], [], [], []
            for b in self._blas:
                bp = np.concatenate(b["positions"])
                bt = np.concatenate(b["tri_vidx"])
                parts_p.append(bp)
                parts_n.append(np.concatenate(b["normals"]))
                parts_t.append(np.concatenate(b["tangents"]))
                parts_u.append(np.concatenate(b["uvs"]))
                parts_v.append(bt + voff)
                parts_m.append(np.concatenate(b["tri_mat"]))
                parts_a.append(np.concatenate(b["tri_alpha"]))
                parts_x.append(np.concatenate(b["tri_ntex"]))
                blas_ranges.append((toff, toff + bt.shape[0]))
                voff += bp.shape[0]
                toff += bt.shape[0]
            positions = np.concatenate([positions, *parts_p])
            normals = np.concatenate([normals, *parts_n])
            tangents = np.concatenate([tangents, *parts_t])
            uvs = np.concatenate([uvs, *parts_u])
            tri_vidx = np.concatenate([tri_vidx, *parts_v])
            tri_mat = np.concatenate([tri_mat, *parts_m])
            tri_alpha = np.concatenate([tri_alpha, *parts_a])
            tri_ntex = np.concatenate([tri_ntex, *parts_x])

        from ..accel.intersect import build_tri_table

        geom = Geometry(
            positions=jnp.asarray(positions),
            normals=jnp.asarray(normals),
            tangents=jnp.asarray(tangents),
            uvs=jnp.asarray(uvs),
            tri_vidx=jnp.asarray(tri_vidx),
            tri_mat=jnp.asarray(tri_mat),
            tri_alpha=jnp.asarray(tri_alpha),
            tri_ntex=jnp.asarray(tri_ntex),
            tri_table=jnp.asarray(build_tri_table(
                positions, normals, tangents, uvs, tri_vidx, tri_mat,
                tri_alpha, tri_ntex,
            )),
        )

        # Material SoA.
        m = len(self.materials)
        # Table width = the scene's actual max lobe count (<= MAX_LOBES):
        # every per-lobe texture eval / dispatch op is O(R * L), so a scene
        # of single-lobe materials does a quarter of the padded-to-4 work.
        l_max = max((len(mat.lobes) for mat in self.materials), default=1)
        l_max = max(l_max, 1)
        lobe_kind = np.zeros((m, l_max), np.int32)
        lobe_stex = np.full((m, l_max, 3), -1, np.int32)
        lobe_ftex = np.full((m, l_max, 2), -1, np.int32)
        lobe_wtex = np.full((m, l_max), -1, np.int32)
        emit_stex = np.full((m,), -1, np.int32)
        for i, mat in enumerate(self.materials):
            for j, lb in enumerate(mat.lobes):
                lobe_kind[i, j] = lb.kind
                lobe_stex[i, j] = lb.stex
                lobe_ftex[i, j] = lb.ftex
                lobe_wtex[i, j] = lb.wtex
            emit_stex[i] = mat.emit_stex
        materials = Materials(
            lobe_kind=jnp.asarray(lobe_kind),
            lobe_stex=jnp.asarray(lobe_stex),
            lobe_ftex=jnp.asarray(lobe_ftex),
            lobe_wtex=jnp.asarray(lobe_wtex),
            emit_stex=jnp.asarray(emit_stex),
        )
        # Static kind set: the BSDF dispatchers compile only kinds a scene
        # actually uses (the analogue of the reference constructing only the
        # closures a material owns).
        lobe_kinds_present = tuple(sorted(
            int(k) for k in np.unique(lobe_kind) if k != int(LobeKind.NONE)
        ))

        # Texture SoA (pad with one dummy row so tables are never empty).
        stexs = self.stex or [_STex(STexKind.CONST, np.zeros(s, np.float32),
                                    np.zeros(s, np.float32))]
        ftexs = self.ftex or [_FTex(FTexKind.CONST)]
        if self.images:
            hmax = max(im.shape[0] for im in self.images)
            wmax = max(im.shape[1] for im in self.images)
            atlas = np.zeros((len(self.images), hmax, wmax, 4), np.float32)
            image_hw = np.zeros((len(self.images), 2), np.int32)
            for i, im in enumerate(self.images):
                atlas[i, : im.shape[0], : im.shape[1]] = im
                image_hw[i] = (im.shape[0], im.shape[1])
        else:
            atlas = np.zeros((0, 1, 1, 4), np.float32)
            image_hw = np.zeros((0, 2), np.int32)
        if self.spectral:
            # Pre-tabulate CONSTANT spectral textures into per-nm curves
            # (exact: the Meng-Simon basis is piecewise linear with 5nm
            # knots). Renders of scenes without image/checker/voronoi
            # spectra then skip the grid machinery entirely (has_const).
            from ..spectrum.spectral import (
                WL_HI as _hi,
                WL_LO as _lo,
                upsample_tabulate_host,
            )

            grid = np.linspace(_lo, _hi, int(round(_hi - _lo)) + 1)
            for st in stexs:
                if st.kind == STexKind.CONST:
                    vals = upsample_tabulate_host(
                        float(st.value[0]), float(st.value[1]),
                        float(st.value[2]), grid,
                    )
                    st.kind = STexKind.CURVE
                    st.curve_id = self.add_curve(grid, vals)
                    st.value = np.zeros_like(st.value)
                    st.value[0] = 1.0

        if self.curves:
            from ..spectrum.spectral import WL_HI, WL_LO

            # Regular per-nm resampling (see SpectrumTextures docstring):
            # linear interpolation within each curve's native domain, zero
            # outside it (RegularContinuousSpectrum evaluates 0 out of range).
            grid_n = int(round(WL_HI - WL_LO)) + 1
            grid = np.linspace(WL_LO, WL_HI, grid_n)
            curves_wl = np.zeros((len(self.curves), 2), np.float32)
            curves_v = np.zeros((len(self.curves), grid_n), np.float32)
            for i, (wl, v) in enumerate(self.curves):
                curves_wl[i] = (wl[0], wl[-1])
                vals = np.interp(grid, wl, v)
                vals[(grid < wl[0]) | (grid > wl[-1])] = 0.0
                curves_v[i] = vals
            curves_wl_j = jnp.asarray(curves_wl)
            curves_v_j = jnp.asarray(curves_v)
        else:
            curves_wl_j = jnp.zeros((0, 2), jnp.float32)
            curves_v_j = jnp.zeros((0, 1), jnp.float32)
        stex = SpectrumTextures(
            kind=jnp.asarray([t.kind for t in stexs], jnp.int32),
            value=jnp.asarray(np.stack([t.value for t in stexs])),
            value2=jnp.asarray(np.stack([t.value2 for t in stexs])),
            image_id=jnp.asarray([t.image_id for t in stexs], jnp.int32),
            map_scale=jnp.asarray([t.map_scale for t in stexs], jnp.float32),
            map_offset=jnp.asarray([t.map_offset for t in stexs], jnp.float32),
            images=jnp.asarray(atlas),
            image_hw=jnp.asarray(image_hw),
            curve_id=jnp.asarray([t.curve_id for t in stexs], jnp.int32),
            curves_wl=curves_wl_j,
            curves_v=curves_v_j,
            spectral=self.spectral,
            has_checker=any(
                t.kind == STexKind.CHECKER for t in stexs
            ) or any(t.kind == FTexKind.CHECKER for t in ftexs),
            has_voronoi=any(t.kind == STexKind.VORONOI for t in stexs),
            has_curve=any(t.kind == STexKind.CURVE for t in stexs),
            has_const=any(t.kind == STexKind.CONST for t in stexs),
        )
        ftex = FloatTextures(
            kind=jnp.asarray([t.kind for t in ftexs], jnp.int32),
            value=jnp.asarray([t.value for t in ftexs], jnp.float32),
            value2=jnp.asarray([t.value2 for t in ftexs], jnp.float32),
            image_id=jnp.asarray([t.image_id for t in ftexs], jnp.int32),
            map_scale=jnp.asarray([t.map_scale for t in ftexs], jnp.float32),
            map_offset=jnp.asarray([t.map_offset for t in ftexs], jnp.float32),
            has_image=any(t.kind == FTexKind.IMAGE for t in ftexs),
            has_voronoi=any(t.kind == FTexKind.VORONOI for t in ftexs),
            has_one_minus=any(t.kind == FTexKind.ONE_MINUS for t in ftexs),
        )

        # Light table: every emissive triangle is one light with importance 1
        # (SurfaceObject.cpp:69-71); env sphere adds importance 1 if present.
        # Instanced emitters are baked by the flattener, so the light table
        # only scans the static prefix.
        emissive = emit_stex[tri_mat[:n_static]] >= 0
        # Build-time invariant: an emissive material in the instanced TAIL
        # would be invisible to NEE (the light table covers only the static
        # prefix) while implicit hits still get MIS-downweighted by a light
        # pdf NEE can never realize — a silent energy bias. The flattener
        # keeps emissive subtrees static (_subtree_emits, scene/graph.py);
        # raise loudly if that invariant is ever violated.
        if tri_mat.shape[0] > n_static:
            tail_emissive = emit_stex[tri_mat[n_static:]] >= 0
            if tail_emissive.any():
                bad = np.unique(tri_mat[n_static:][tail_emissive])
                raise ValueError(
                    f"emissive material(s) {bad.tolist()} are referenced by "
                    "instanced/animated geometry; lights on instances are "
                    "not samplable by NEE (the light table covers the "
                    "static prefix only) and would render biased. Keep "
                    "emissive subtrees static."
                )
        light_tris = np.nonzero(emissive)[0].astype(np.int32)
        n_area = len(light_tris)
        if n_area == 0:
            light_tris = np.zeros((1,), np.int32)
        dist = build_discrete_1d(jnp.ones((max(n_area, 1),), jnp.float32))
        env_imp = 1.0 if self.env_stex >= 0 else 0.0
        env_prob = env_imp / max(env_imp + n_area, 1.0)
        lights = Lights(
            tri_idx=jnp.asarray(light_tris),
            dist=dist,
            env_prob=jnp.float32(env_prob),
        )

        # Env-light importance map (luminance * sin(theta)) if textured.
        if self.env_stex >= 0 and self.stex[self.env_stex].kind == STexKind.IMAGE:
            img = self.images[self.stex[self.env_stex].image_id]
            lum = (
                0.222485 * img[..., 0] + 0.716905 * img[..., 1] + 0.060610 * img[..., 2]
            )
            h = img.shape[0]
            sin_t = np.sin(np.pi * (np.arange(h) + 0.5) / h)
            env_dist = build_continuous_2d(jnp.asarray(lum * sin_t[:, None]))
        else:
            env_dist = build_continuous_2d(jnp.ones((4, 8), jnp.float32))
        env = EnvLight(
            stex=jnp.int32(self.env_stex),
            dist=env_dist,
            scale=jnp.float32(self.env_scale),
        )

        # Two-level structure for instanced / animated geometry.
        instances = None
        if inst_rows:
            from ..accel.instances import build_instances

            instances = build_instances(
                positions, tri_vidx, blas_ranges, inst_rows
            )
        elif self._blas and not self.instance_rows:
            raise ValueError("BLAS recorded but no instances added")

        # World bounding sphere (Scene::build, SurfaceObject.cpp:400-405):
        # static geometry (excluding any never-hit dummy at 1e30) plus the
        # instances' motion bounds.
        static_verts = positions[tri_vidx[:n_static].reshape(-1)]
        static_verts = static_verts[np.abs(static_verts).max(axis=1) < 1e29]
        boxes = []
        if len(static_verts):
            boxes.append((static_verts.min(axis=0), static_verts.max(axis=0)))
        if instances is not None:
            boxes.append((
                np.asarray(instances.inst_bmin).min(axis=0),
                np.asarray(instances.inst_bmax).max(axis=0),
            ))
        lo = np.min([b[0] for b in boxes], axis=0)
        hi = np.max([b[1] for b in boxes], axis=0)
        center = 0.5 * (lo + hi)
        radius = float(np.linalg.norm(hi - center)) + 1e-3

        # Static-prefix views for the single-level accelerators.
        geom_static = geom.replace(
            tri_vidx=jnp.asarray(tri_vidx[:n_static]),
            tri_mat=jnp.asarray(tri_mat[:n_static]),
            tri_alpha=jnp.asarray(tri_alpha[:n_static]),
            tri_ntex=jnp.asarray(tri_ntex[:n_static]),
        )

        bvh = None
        if use_bvh:
            from ..accel.lbvh import build_bvh

            bvh = build_bvh(positions, tri_vidx[:n_static])

        from ..accel.plucker import build_plucker

        plucker = build_plucker(geom_static)

        from ..accel.pallas_intersect import (
            build_pallas_tris,
            build_super_boxes,
            extend_pallas_instanced,
        )

        # The kernel chunk tables are cut from the SBVH when available —
        # spatially tight treelet chunks (canonical maximal subtrees, boxes
        # from the subtree nodes so SBVH chopped references stay tight)
        # traversed front-to-back. Chunk width 128 measured best on TPU:
        # the kernel loop is latency-bound per visited entry, so fewer,
        # fatter entries win even at partial fill.
        pallas_tris = build_pallas_tris(geom_static, bvh=bvh)
        if instances is not None:
            # One kernel covers the whole two-level scene: instanced BLAS
            # chunks become (chunk, instance) worklist entries with the ray
            # block transformed in-kernel (accel/pallas_intersect.py).
            pallas_tris = extend_pallas_instanced(
                pallas_tris, positions, tri_vidx, blas_ranges, inst_rows,
            )

        from .types import NormalTextures

        nts = self.ntex or [{
            "kind": 0, "image_id": -1, "step_width": 1.0, "reverse": 0.0,
            "map_scale": (1.0, 1.0), "map_offset": (0.0, 0.0),
        }]
        ntex_table = NormalTextures(
            kind=jnp.asarray([t["kind"] for t in nts], jnp.int32),
            image_id=jnp.asarray([t["image_id"] for t in nts], jnp.int32),
            step_width=jnp.asarray([t["step_width"] for t in nts], jnp.float32),
            reverse=jnp.asarray([t["reverse"] for t in nts], jnp.float32),
            map_scale=jnp.asarray([t["map_scale"] for t in nts], jnp.float32),
            map_offset=jnp.asarray([t["map_offset"] for t in nts], jnp.float32),
        )

        return FlatScene(
            geometry=geom,
            materials=materials,
            stex=stex,
            ftex=ftex,
            lights=lights,
            env=env,
            camera=self.camera,
            bvh=bvh,
            plucker=plucker,
            pallas_tris=pallas_tris,
            ntex=ntex_table,
            instances=instances,
            n_static=n_static,
            lobe_kinds_present=lobe_kinds_present,
            has_env=self.env_stex >= 0,
            has_normal_map=bool((tri_ntex >= 0).any()),
            has_alpha=bool((tri_alpha >= 0).any()),
            world_center=jnp.asarray(center),
            world_radius=jnp.float32(radius),
            super_boxes_blob=(
                np.asarray(
                    build_super_boxes(np.asarray(pallas_tris.boxes)),
                    np.float32,
                ).tobytes()
                if pallas_tris is not None else None
            ),
        )
