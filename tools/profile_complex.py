"""On-chip marginal-rate A/B for the complex783 loop-scene kernel.

Usage: python tools/profile_complex.py   (env knobs applied per label)
"""

import os
import subprocess
import sys
import time

# r5 sweep results (marginal Mrays/s, complex783 512x512, two sessions;
# run-to-run tunnel noise ~+-15%): cull-on 15-20 across block sizes
# 16/24/32/48 (differences inside noise), cull-off 12-13, sublanes=8
# 12.2. Default stays block16 + cull on + sublanes 16.
LABELS = [
    ("default (block16, cull)", {}),
    ("hoist", {"SE195_PT_HOIST": "1"}),
    ("default (rep)", {}),
    ("hoist (rep)", {"SE195_PT_HOIST": "1"}),
]

CHILD = r"""
import time
import numpy as np
import jax.numpy as jnp
from se195_raytracer_tpu.core.config import RenderConfig
from se195_raytracer_tpu.driver.render import render
from se195_raytracer_tpu.scenes.registry import get_scene

spec = get_scene("complex")
scene, cam = spec.to_scene(), spec.to_camera()

def timed_spp(spp):
    cfg = RenderConfig(width=512, height=512, spp=spp, integrator="pt",
                       use_pallas=True)
    img, st = render(scene, cam, cfg)
    np.asarray(img)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        img, st = render(scene, cam, cfg, state=st)
        np.asarray(img)
        best = min(best, time.perf_counter() - t0)
    return best

lo, hi = 8, 72
tl, th = timed_spp(lo), timed_spp(hi)
marg = 512 * 512 * (hi - lo) / max(th - tl, 1e-9)
print(f"RESULT lo={tl:.4f} hi={th:.4f} marginal={marg/1e6:.1f} Mrays/s",
      flush=True)
"""


def main():
    for label, env in LABELS:
        e = dict(os.environ)
        e.update(env)
        t0 = time.time()
        p = subprocess.run([sys.executable, "-c", CHILD], env=e,
                           capture_output=True, text=True)
        out = [l for l in p.stdout.splitlines() if l.startswith("RESULT")]
        msg = out[0] if out else f"FAILED rc={p.returncode}: " + \
            (p.stderr.splitlines()[-1][:120] if p.stderr.splitlines() else "")
        print(f"{label}: {msg}  ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
