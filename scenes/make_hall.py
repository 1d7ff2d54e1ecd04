"""Generate the 1080p benchmark scene: a many-light hall with ~100k
triangles of fluted-column geometry in a .glb mesh (BASELINE.md
measurement config 5: "1920x1080 many-light glTF scene").

Run (or import ensure_assets()) to write scenes/generated/:
  hall_columns.glb  — the column forest (one glTF binary, ~100k tris)
  hall_shell.obj    — floor/ceiling/walls
  hall_lights.obj   — 8x8 emissive ceiling panels

The scene file scenes/hall.txt references these; everything regenerates
deterministically, so the binaries stay out of git.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

GEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "generated")

HALL_W = 24.0  # x extent
HALL_H = 9.0  # y extent
HALL_D = 44.0  # z extent
COLS_X, COLS_Z = 4, 8
FLUTES = 28
SEGS = 20
LIGHTS_X, LIGHTS_Z = 8, 8


def _column(cx, cz, rng) -> np.ndarray:
    """One fluted column with base/capital rings -> [n, 3, 3] tris."""
    tris = []

    def lathe(profile, n_around, y0, y1, rings):
        """Revolve a radius profile r(t) around (cx, *, cz)."""
        ys = np.linspace(y0, y1, rings + 1)
        ts = np.linspace(0.0, 1.0, rings + 1)
        ang = np.linspace(0, 2 * np.pi, n_around + 1)
        radii = np.broadcast_to(
            profile(ts[:, None], ang[:-1][None, :]),
            (rings + 1, n_around),
        )  # [rings+1, n_around]
        # vertex grid [rings+1, n_around, 3]
        px = cx + radii * np.cos(ang[:-1])[None, :]
        pz = cz + radii * np.sin(ang[:-1])[None, :]
        py = np.broadcast_to(ys[:, None], radii.shape)
        grid = np.stack([px, py, pz], axis=-1)
        for i in range(rings):
            a = grid[i]
            b = grid[i + 1]
            a2 = np.roll(a, -1, axis=0)
            b2 = np.roll(b, -1, axis=0)
            tris.append(np.stack([a, b, a2], axis=1))
            tris.append(np.stack([a2, b, b2], axis=1))

    # fluted shaft: radius modulated around the circumference
    r0 = 0.55 + rng.uniform(-0.05, 0.05)
    depth = 0.06

    def shaft(t, ang):
        taper = 1.0 - 0.15 * t
        return (r0 + depth * np.cos(FLUTES * ang)) * taper

    lathe(shaft, FLUTES * 2, 0.4, HALL_H - 1.0, SEGS)
    # base + capital (torus-ish bulges)
    lathe(lambda t, a: (r0 + 0.25) * (1 - 0.4 * t), 24, 0.0, 0.4, 3)
    lathe(lambda t, a: (r0 + 0.05 + 0.3 * t), 24, HALL_H - 1.0, HALL_H, 3)
    return np.concatenate(tris).astype(np.float32)


def _tri_normals(tris: np.ndarray) -> np.ndarray:
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return np.repeat(n[:, None, :], 3, axis=1)


def _write_glb(path: str, tris: np.ndarray) -> None:
    """Minimal non-indexed glTF 2.0 binary: POSITION + NORMAL."""
    pos = tris.reshape(-1, 3).astype(np.float32)
    nrm = _tri_normals(tris).reshape(-1, 3).astype(np.float32)
    pos_b, nrm_b = pos.tobytes(), nrm.tobytes()
    bin_chunk = pos_b + nrm_b
    gltf = {
        "asset": {"version": "2.0", "generator": "restir_tpu make_hall"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0, "NORMAL": 1}, "mode": 4}
        ]}],
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_b)},
            {"buffer": 0, "byteOffset": len(pos_b), "byteLength": len(nrm_b)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(pos),
             "type": "VEC3",
             "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5126, "count": len(nrm),
             "type": "VEC3"},
        ],
    }
    js = json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    bin_chunk += b"\x00" * (-len(bin_chunk) % 4)
    total = 12 + 8 + len(js) + 8 + len(bin_chunk)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(bin_chunk), 0x004E4942))
        f.write(bin_chunk)


def _write_obj(path: str, quads) -> None:
    """quads: list of [4, 3] corner arrays (ccw)."""
    with open(path, "w") as f:
        for q in quads:
            for v in q:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for i in range(len(quads)):
            b = 4 * i
            f.write(f"f {b+1} {b+2} {b+3}\n")
            f.write(f"f {b+1} {b+3} {b+4}\n")


def _quad(center, u, v):
    c = np.asarray(center, np.float64)
    u = np.asarray(u, np.float64)
    v = np.asarray(v, np.float64)
    return [c - u - v, c + u - v, c + u + v, c - u + v]


def ensure_assets() -> str:
    """Generate assets if missing; returns the scenes/ directory."""
    os.makedirs(GEN, exist_ok=True)
    glb = os.path.join(GEN, "hall_columns.glb")
    if not os.path.exists(glb):
        rng = np.random.default_rng(7)
        cols = []
        xs = np.linspace(-HALL_W / 2 + 3.0, HALL_W / 2 - 3.0, COLS_X)
        zs = np.linspace(-HALL_D / 2 + 3.0, HALL_D / 2 - 3.0, COLS_Z)
        for x in xs:
            for z in zs:
                cols.append(_column(x, z, rng))
        tris = np.concatenate(cols)
        _write_glb(glb, tris)

    shell = os.path.join(GEN, "hall_shell.obj")
    if not os.path.exists(shell):
        w, h, d = HALL_W / 2, HALL_H, HALL_D / 2
        quads = [
            _quad((0, 0, 0), (w, 0, 0), (0, 0, d)),        # floor
            _quad((0, h, 0), (0, 0, d), (w, 0, 0)),        # ceiling
            _quad((-w, h / 2, 0), (0, 0, d), (0, h / 2, 0)),   # left wall
            _quad((w, h / 2, 0), (0, h / 2, 0), (0, 0, d)),    # right wall
            _quad((0, h / 2, -d), (w, 0, 0), (0, h / 2, 0)),   # far wall
            _quad((0, h / 2, d), (0, h / 2, 0), (w, 0, 0)),    # near wall
        ]
        _write_obj(shell, quads)

    lights = os.path.join(GEN, "hall_lights.obj")
    if not os.path.exists(lights):
        quads = []
        xs = np.linspace(-HALL_W / 2 + 2.0, HALL_W / 2 - 2.0, LIGHTS_X)
        zs = np.linspace(-HALL_D / 2 + 2.5, HALL_D / 2 - 2.5, LIGHTS_Z)
        for x in xs:
            for z in zs:
                # downward-facing panels just under the ceiling
                quads.append(_quad((x, HALL_H - 0.02, z),
                                   (0.45, 0, 0), (0, 0, 0.45)))
        _write_obj(lights, quads)
    return os.path.dirname(GEN)


if __name__ == "__main__":
    d = ensure_assets()
    print(f"assets in {os.path.join(d, 'generated')}")
