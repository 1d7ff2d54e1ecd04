"""Minimal glTF 2.0 loader tests (the reference's loader is a stub)."""

import base64
import json
import struct

import numpy as np
import pytest

from restir_tpu.scene.loader import load_gltf, load_mesh


def _tri_gltf(tmp_path, name="tri.gltf", translation=None):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.array([[0, 0, 1]] * 3, np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    bin_data = pos.tobytes() + nrm.tobytes() + idx.tobytes()

    node = {"mesh": 0}
    if translation:
        node["translation"] = translation
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [{
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1},
                "indices": 2,
            }]
        }],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(bin_data),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(bin_data).decode(),
        }],
    }
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p), bin_data, doc


def test_load_gltf_triangle(tmp_path):
    path, _, _ = _tri_gltf(tmp_path)
    v, n, uv = load_gltf(path)
    assert v.shape == (3, 3)
    assert np.allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    assert np.allclose(n, [0, 0, 1])
    assert uv.shape == (3, 2)


def test_load_gltf_node_translation(tmp_path):
    path, _, _ = _tri_gltf(tmp_path, translation=[1.0, 2.0, 3.0])
    v, n, uv = load_gltf(path)
    assert np.allclose(v[0], [1, 2, 3])
    assert np.allclose(n, [0, 0, 1])  # normals unaffected by translation


def test_load_glb_container(tmp_path):
    path, bin_data, doc = _tri_gltf(tmp_path)
    doc["buffers"] = [{"byteLength": len(bin_data)}]
    json_chunk = json.dumps(doc).encode()
    json_chunk += b" " * (-len(json_chunk) % 4)
    bin_chunk = bin_data + b"\0" * (-len(bin_data) % 4)
    glb = struct.pack("<III", 0x46546C67, 2,
                      12 + 8 + len(json_chunk) + 8 + len(bin_chunk))
    glb += struct.pack("<II", len(json_chunk), 0x4E4F534A) + json_chunk
    glb += struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk
    p = tmp_path / "tri.glb"
    p.write_bytes(glb)
    v, n, uv = load_gltf(str(p))
    assert v.shape == (3, 3)
    assert np.allclose(v, [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_load_mesh_dispatch(tmp_path):
    path, _, _ = _tri_gltf(tmp_path)
    v, _, _ = load_mesh(path)
    assert v.shape == (3, 3)
