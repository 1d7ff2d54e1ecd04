"""Headline benchmark: 1080p spatiotemporal ReSTIR DI fps on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
BASELINE.md measurement config 5: full spatiotemporal ReSTIR DI +
a-trous (EAW) denoiser at 1920x1080 on a many-light scene, single chip.
Baseline target: >= 30 fps. The CUDA reference publishes no numbers, so
vs_baseline is fps / 30.
"""

from __future__ import annotations

import json
import time


def main():
    import jax

    # persistent compile cache: repeat runs skip the multi-minute XLA
    # compile of the 1080p frame program
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from restir_tpu import renderer
    from restir_tpu.config import DenoiserType, RenderConfig, TracerType
    from restir_tpu.ops.camera import make_camera
    from restir_tpu.scene.procedural import many_light_scene

    width, height = 1920, 1080
    warmup = 2

    scene, camkw = many_light_scene(n_lights=64, n_blocks=24)
    cam = make_camera(**camkw)
    cfg = RenderConfig(width=width, height=height, tracer=TracerType.RESTIR_DI,
                       denoiser=DenoiserType.EAW)

    def sync(x):
        # NOTE: block_until_ready() does not reliably wait through the
        # axon PJRT relay; fetching a scalar reduction forces execution.
        import jax.numpy as jnp

        return float(jnp.sum(x))

    state = renderer.init_state(cfg, cam, scene)
    t0 = time.perf_counter()
    for _ in range(warmup):
        state, frame = renderer.step_jit(scene, state, cam, cfg)
    sync(frame)
    per_frame = (time.perf_counter() - t0) / warmup

    # pick a frame count that keeps the measured run under ~100 s
    frames = max(3, min(64, int(100.0 / max(per_frame, 1e-3))))

    t0 = time.perf_counter()
    for _ in range(frames):
        state, frame = renderer.step_jit(scene, state, cam, cfg)
    sync(frame)
    dt = time.perf_counter() - t0

    fps = frames / dt
    print(
        json.dumps(
            {
                "metric": "restir_di_1080p_spatiotemporal_eaw_fps",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
