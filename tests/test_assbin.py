"""Assimp binary-dump (.assbin) import: reader round-trip + load3DModel
integration with the DSL material-override callback
(node_constructor.cpp:35-105 semantics). The sandbox ships no assimp CLI,
so fixtures are written by utils/assbin.write_assbin (same documented
layout the reader parses: 512-byte header + length-prefixed chunks)."""
from __future__ import annotations

import os
import textwrap

import numpy as np
import pytest

from slr_tpu.utils.assbin import (
    AssbinMesh, AssbinNode, AssbinScene, read_assbin, write_assbin,
)

pytestmark = pytest.mark.quick


def _fixture_scene() -> AssbinScene:
    tri = AssbinMesh(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.tile(np.array([[0, 0, 1]], np.float32), (3, 1)),
        tangents=np.tile(np.array([[1, 0, 0]], np.float32), (3, 1)),
        texcoords=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        material_index=0,
    )
    quad = AssbinMesh(
        positions=np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                           np.float32),
        normals=None, tangents=None, texcoords=None,
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        material_index=1,
    )
    child = AssbinNode(
        name="child",
        transform=np.array(
            [[1, 0, 0, 2], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float32),
        mesh_indices=[1],
    )
    root = AssbinNode(name="root", transform=np.eye(4, dtype=np.float32),
                      mesh_indices=[0], children=[child])
    return AssbinScene(root=root, meshes=[tri, quad],
                       material_names=["mat_tri", "mat_quad"])


def test_roundtrip(tmp_path):
    path = str(tmp_path / "fixture.assbin")
    write_assbin(path, _fixture_scene())
    sc = read_assbin(path)
    assert sc.root.name == "root"
    assert sc.root.children[0].name == "child"
    assert sc.material_names == ["mat_tri", "mat_quad"]
    assert len(sc.meshes) == 2
    np.testing.assert_allclose(
        sc.meshes[0].positions,
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(sc.meshes[0].texcoords,
                               [[0, 0], [1, 0], [0, 1]])
    assert sc.meshes[1].normals is None
    np.testing.assert_array_equal(sc.meshes[1].faces,
                                  [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(sc.root.children[0].transform[0, 3], 2.0)


def test_rejects_non_assbin(tmp_path):
    p = tmp_path / "bogus.assbin"
    p.write_bytes(b"not a dump")
    with pytest.raises(ValueError):
        read_assbin(str(p))


def test_load3dmodel_imports_assbin(tmp_path):
    """load3DModel resolves a real .assbin: node transforms baked into
    vertices, per-mesh materials routed through the DSL override callback
    by material NAME (API.cpp:800-925 + node_constructor.cpp)."""
    from slr_tpu.scene.api import load_scene

    write_assbin(str(tmp_path / "model.assbin"), _fixture_scene())
    scene_txt = tmp_path / "scene.txt"
    scene_txt.write_text(textwrap.dedent("""
        setRenderer("method": "PT", ("samples": 1,));
        setRenderSettings("width": 8, "height": 8);
        function mapMat(name, attrs) {
            if (name == "mat_tri") {
                return createSurfaceMaterial(
                    "matte", (SpectrumTexture(Spectrum(0.9, 0.1, 0.1)),));
            }
            return createSurfaceMaterial(
                "matte", (SpectrumTexture(Spectrum(0.1, 0.1, 0.9)),));
        }
        model = load3DModel("model.assbin", mapMat);
        addChild(root, model);
        lightTex = SpectrumTexture(Spectrum(10, 10, 10));
        scatter = createSurfaceMaterial("matte", (SpectrumTexture(Spectrum(0.9, 0.9, 0.9)),));
        emitter = createEmitterSurfaceProperty("diffuse", (lightTex,));
        lm = createSurfaceMaterial("emitter", (scatter, emitter));
        lq = createMesh(
          (
            ((-0.2, 2, -0.2), (0, -1, 0), (1, 0, 0), (0, 0)),
            (( 0.2, 2, -0.2), (0, -1, 0), (1, 0, 0), (1, 0)),
            (( 0.2, 2,  0.2), (0, -1, 0), (1, 0, 0), (1, 1)),
            ((-0.2, 2,  0.2), (0, -1, 0), (1, 0, 0), (0, 1))
          ),
          ((lm, ((0, 1, 2), (0, 2, 3))),)
        );
        addChild(root, lq);
        cameraNode = createNode();
        camera = createPerspectiveCamera("aspect": 1.0, "fovY": 1.0,
                                         "radius": 0.0, "imgDist": 1.0,
                                         "objDist": 5.0);
        addChild(cameraNode, camera);
        setTransform(cameraNode, translate(0.0, 0.0, 5.0) * rotateY(3.1415926536));
        addChild(root, cameraNode);
    """))
    scene, settings, _ = load_scene(str(scene_txt))
    geom = scene.geometry
    # 1 tri + 2 quad tris + 2 light tris
    assert geom.num_tris == 5
    pos = np.asarray(geom.positions)
    # the child node's +2x translation must be baked into the quad
    assert pos[:, 0].max() >= 2.9  # quad spans [-1,1], shifted to [1,3]
    # two distinct override materials + light materials present
    assert len(np.unique(np.asarray(geom.tri_mat))) >= 3
