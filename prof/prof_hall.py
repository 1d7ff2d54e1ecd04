"""Hall-scene frame + stage timings on the real TPU.

PYTHONPATH=/root/repo:/root/.axon_site python prof/prof_hall.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "scenes"))


def sync(x):
    return float(jnp.sum(x))


def main():
    from make_hall import ensure_assets
    ensure_assets()
    from restir_tpu.scene.loader import parse_scene_file
    from restir_tpu import renderer
    from restir_tpu.config import DenoiserType, RenderConfig, TracerType

    sf = parse_scene_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scenes", "hall.txt"))
    scene = sf.build()
    cam = sf.make_camera()
    cfg = RenderConfig(width=1920, height=1080,
                       tracer=TracerType.RESTIR_DI,
                       denoiser=DenoiserType.EAW)

    state = renderer.init_state(cfg, cam, scene)
    t0 = time.perf_counter()
    state, frame = renderer.step_jit(scene, state, cam, cfg)
    sync(frame)
    print(f"first frame (compile): {time.perf_counter() - t0:.1f} s")

    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        state, frame = renderer.step_jit(scene, state, cam, cfg)
    sync(frame)
    dt = (time.perf_counter() - t0) / n
    print(f"hall frame: {dt * 1000:.0f} ms ({1 / dt:.2f} fps)")


if __name__ == "__main__":
    main()
