"""Times ONLY the device-side Whitted trace (rays pre-staged on device),
separating kernel cost from host ray-gen + tunnel transfer."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from se195_raytracer_tpu.kernels.whitted_kernel import (
        DEF_SUBLANES, LANES, pack_whitted_scene, whitted_trace_pallas_padded,
    )
    from se195_raytracer_tpu.models.whitted import whitted_camera_rays
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    scene = WHITTED_SCENES[sys.argv[1] if len(sys.argv) > 1 else "room"]()
    w, h = 800, 600
    o, d = whitted_camera_rays(w, h, 3)
    r = o.shape[0]
    tile = DEF_SUBLANES * LANES
    rp = ((r + tile - 1) // tile) * tile
    packed = np.zeros((6, rp), np.float32)
    packed[0:3, :r] = np.asarray(o).T
    packed[3:6, :r] = np.asarray(d).T
    rays = jax.device_put(jnp.asarray(packed.reshape(6, rp // LANES, LANES)))
    tab = jax.device_put(pack_whitted_scene(scene))
    kw = dict(ptype=scene.ptype, is_light=scene.is_light,
              trace_depth=5, hit_bias=0.0)

    out = whitted_trace_pallas_padded(tab, rays, **kw)
    np.asarray(out)  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = whitted_trace_pallas_padded(tab, rays, **kw)
        np.asarray(out[0, 0])  # sync via tiny fetch
        best = min(best, time.perf_counter() - t0)
    print(f"device-only trace: {best*1e3:.1f} ms  {r/best/1e6:.2f} Mrays/s")


if __name__ == "__main__":
    main()
