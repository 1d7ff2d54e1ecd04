"""ReSTIR GI 1080p stage split: full frame, then (state freed) the
G-buffer program, the fused trace kernel, and the whole GI pipeline
(trace + reservoir/temporal/shade). Sequential phases to stay inside
the v5e HBM budget; within each phase, repeated timed runs.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_gi.py
"""
import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from restir_tpu import renderer
from restir_tpu.config import RenderConfig, TracerType
from restir_tpu.models import gbuffer as gbuf
from restir_tpu.models import restir_gi
from restir_tpu.ops.camera import make_camera
from restir_tpu.scene.procedural import cornell_box


def sync(tree):
    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf))


def bench(name, fn, reps=6, inner=2):
    t0 = time.time()
    out = fn()
    sync(out)
    print(f"{name} first {time.time() - t0:.1f}s", flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn()
        sync(out)
        ts.append((time.perf_counter() - t0) / inner)
    ts = sorted(ts)
    print(f"{name}: min {ts[0]*1e3:.1f} ms  med {ts[len(ts)//2]*1e3:.1f} ms",
          flush=True)
    return out


width, height = 1920, 1080
cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_GI)
scene, camkw = cornell_box()
cam = make_camera(**camkw)

# ---- phase 1: full frame
state = renderer.init_state(cfg, cam, scene)
holder = {"state": state}
del state


def frame_step():
    holder["state"], img = renderer.step_jit(scene, holder["state"], cam, cfg)
    return img


bench("frame", frame_step)
looper = holder["state"].looper
del holder  # free the render state before standalone stages

# ---- phase 2: G-buffer program
@functools.partial(jax.jit, static_argnames=("cfg",))
def gbuffer_prog(scene, cam, cfg, looper):
    return gbuf.render_gbuffer(scene, cam, cam, cfg, looper)


gb, it, mat, ray_dir = bench(
    "gbuffer", lambda: gbuffer_prog(scene, cam, cfg, looper))

# ---- phase 3: fused trace kernel
@functools.partial(jax.jit, static_argnames=("cfg",))
def trace_prog(scene, it, mat, ray_dir, cfg, looper):
    return restir_gi.trace_gi_sample_fused(
        scene, it, mat, ray_dir, cfg, looper, jnp.uint32(0))


bench("trace", lambda: trace_prog(scene, it, mat, ray_dir, cfg, looper))

# ---- phase 4: whole GI pipeline (trace + reservoir/temporal/shade)
import restir_tpu.ops.reservoir as rsv

res_in = rsv.zeros_indirect(cfg.num_pixels)


@functools.partial(jax.jit, static_argnames=("cfg",))
def gi_prog(scene, gb, it, mat, ray_dir, res_in, cfg, looper):
    return restir_gi.restir_indirect(
        scene, gb, gb, it, mat, ray_dir, res_in, cfg, looper)


bench("gi_full",
      lambda: gi_prog(scene, gb, it, mat, ray_dir, res_in, cfg, looper))
