"""Split the mega-kernel 'base' (non-geometry, non-temporal) cost by
stubbing stages: full vs epilogue-stubbed vs RIS-core-stubbed, at
32-tri geometry + temporal=False so the residual IS the base.

Monkeypatching module functions requires clearing di_resident_pallas's
jit cache between variants, so timings are sequential (alternating
rounds, min-of reported) rather than interleaved.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_epi.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from restir_tpu.ops.camera import make_camera
from restir_tpu.ops.pallas import fused_di as fk
from restir_tpu.scene.procedural import many_light_scene

width, height = 1920, 1080
r = width * height
scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
cam = make_camera(**camkw)
cam_vec = fk.pack_camera(cam, width, height)
looper = jnp.uint32(0)
prev = jnp.zeros((fk.PT_CH, r))
N_TRI = 32

orig_epi = fk._gbuffer_epilogue
orig_ris = fk._ris_select_core


def stub_epi(out_ref, lcam_ref, mat_ref, best_dist, best_prim,
             best_u, best_v, at, x, y, ox, oy, oz, dx, dy, dz, **kw):
    cg = out_ref.shape[1]
    v = (best_dist + best_u + best_v + at[0]
         + best_prim.astype(jnp.float32))
    for i in range(fk.GB_CH):
        out_ref[i, :, :] = v.reshape(cg, 128)


def stub_ris(gb_ref, psi_a_ref, psi_b_ref, psi_c_ref, lumaux_ref,
             tri_lo_ref, light_ref, pix, looper, *, l_pad, k,
             single_sided, n_area, has_env, has_met=True, rng=None):
    cg = gb_ref.shape[1]
    base = gb_ref[fk.G_POS, :, :] + psi_a_ref[0, 0] + light_ref[0, 0]
    if rng is not None:
        base = base + rng[0][0:cg]
    return tuple(base + float(i) for i in range(fk.RS_CH))


def run():
    return fk.di_resident_pallas(
        cam_vec, cam_vec, looper, prev,
        scene.tri_xform[:, :3 * N_TRI], scene.prim_attr[:N_TRI],
        scene.mat_attr,
        scene.light_verts, scene.light_normal, scene.light_radiance,
        scene.light_area, scene.light_center, scene.light_radius,
        width=width, height=height, k=4, temporal=False)[1]


def measure(name, patch_epi, patch_ris, reps=4):
    fk._gbuffer_epilogue = stub_epi if patch_epi else orig_epi
    fk._ris_select_core = stub_ris if patch_ris else orig_ris
    fk.di_resident_pallas.clear_cache()
    t0 = time.time()
    float(jnp.sum(run()))
    print(f"{name}: compiled {time.time()-t0:.1f}s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(4):
            out = run()
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / 4)
    print(f"{name}: min {best*1e3:.1f} ms", flush=True)
    return best


for rnd in range(2):
    measure("full", False, False)
    measure("epi_stub", True, False)
    measure("ris_stub", False, True)
    measure("both_stub", True, True)
