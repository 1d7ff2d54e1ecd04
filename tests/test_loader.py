"""Scene-file parser + OBJ loader tests (reference format,
scene.cpp:96-433)."""

import os
import textwrap

import numpy as np
import pytest

from restir_tpu.scene.loader import load_obj, parse_scene_file

CUBE_OBJ = textwrap.dedent("""\
    v -1 -1 -1
    v 1 -1 -1
    v 1 1 -1
    v -1 1 -1
    vn 0 0 -1
    vt 0 0
    vt 1 0
    vt 1 1
    vt 0 1
    f 1/1/1 2/2/1 3/3/1 4/4/1
""")

SCENE = textwrap.dedent("""\
    Material light
    Type Light
    BaseColor 40 40 40
    Metallic 0
    Roughness 1
    Ior 1.5
    NormalMap Null

    Material white
    Type Lambertian
    BaseColor 0.9 0.9 0.8
    Metallic 0
    Roughness 1
    Ior 1.5
    NormalMap Null

    Material metal
    Type MetallicWorkflow
    BaseColor 0.8 0.8 0.9
    Metallic 1.0
    Roughness 0.2
    Ior 1.5
    NormalMap Null

    Camera
    Resolution 320 240
    FovY 22.5
    LensRadius 0
    FocalDist 1
    ApertureMask Null
    Sample 100
    Depth 7
    File out_test
    Eye 0 1 5
    Rotation 90 0 0
    Up 0 1 0

    Object quad
    quad.obj
    Material white
    Translate 1 2 3
    Rotate 0 90 0
    Scale 2 2 2

    Object quad2
    quad.obj
    Material metal

    EnvMap Null
""")


@pytest.fixture
def scene_dir(tmp_path):
    (tmp_path / "quad.obj").write_text(CUBE_OBJ)
    (tmp_path / "scene.txt").write_text(SCENE)
    return tmp_path


def test_load_obj_fan_triangulation(tmp_path):
    p = tmp_path / "q.obj"
    p.write_text(CUBE_OBJ)
    v, n, uv = load_obj(str(p))
    assert v.shape == (6, 3)  # quad -> 2 triangles
    assert np.allclose(n, [0, 0, -1])
    assert uv.shape == (6, 2)


def test_load_obj_flat_normals_when_missing(tmp_path):
    p = tmp_path / "t.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    v, n, uv = load_obj(str(p))
    assert np.allclose(n, [0, 0, 1])


def test_parse_scene_file(scene_dir):
    sf = parse_scene_file(str(scene_dir / "scene.txt"))
    assert len(sf.materials) == 3
    assert sf.materials[0].type == 4  # LIGHT
    assert sf.materials[2].metallic == 1.0
    assert len(sf.instances) == 2
    assert sf.instances[0].translation == (1.0, 2.0, 3.0)
    assert sf.instances[0].scale == (2.0, 2.0, 2.0)
    assert sf.instances[1].material_id == 2
    assert sf.resolution == (320, 240)
    assert sf.fov_y == 22.5
    assert sf.trace_depth == 7
    assert sf.max_iterations == 100
    assert sf.image_name == "out_test"
    assert sf.position == (0.0, 1.0, 5.0)
    assert sf.env_map is None


def test_scene_file_builds_and_renders(scene_dir):
    from restir_tpu import renderer
    from restir_tpu.config import RenderConfig, TracerType

    sf = parse_scene_file(str(scene_dir / "scene.txt"))
    scene = sf.build(bvh_impl="numpy")
    cam = sf.make_camera()
    cfg = RenderConfig(width=16, height=12, tracer=TracerType.PT_DIRECT,
                       trace_depth=2)
    state, frame = renderer.render(scene, cam, cfg, 2)
    assert np.isfinite(np.asarray(frame)).all()
