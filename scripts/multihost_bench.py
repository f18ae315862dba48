"""Scaling-efficiency harness — rays/s across mesh sizes.

Two modes:

* ``--virtual N`` (default 8): N virtual CPU devices in this process
  (``xla_force_host_platform_device_count``) — measures the *sharding
  harness* (shard_map dispatch, replication, assembly all-gather) and
  asserts shard-count invariance of the image. Virtual devices
  timeshare the same host cores, so wall-clock here bounds harness
  overhead, not chip scaling; the committed artifact (SCALING.json)
  records both the rays/s trend and the bitwise-invariance check.
* ``--distributed``: real multi-process execution. Brings up
  ``jax.distributed`` (args auto-detected on cloud TPU pods, or pass
  --coordinator/--nproc/--pid), meshes all visible chips, and measures
  the workload on the full global mesh. Run one copy per host:

      python scripts/multihost_bench.py --distributed \
          --coordinator host0:8476 --nproc 2 --pid $SLURM_PROCID

  With ``--virtual N`` as well, each process brings up N virtual CPU
  devices instead of real chips — 2 processes x N devices on localhost
  exercises the REAL multi-process path (DCN-style coordination, global
  mesh spanning processes, cross-process frame assembly) without TPU
  pod hardware; tests/test_multihost.py drives exactly this and pins
  the output bitwise against a single-process render. ``--dump-image``
  writes the process-allgathered frame (pid 0 only) for that check.

BASELINE.json target: >= 85% rays/s efficiency at 1 chip / 1 host /
N hosts. Reference anchor: the reference always ran devices[0]
(smallptGPU.cpp:463-467) — this harness is the gap-filler (SURVEY §2e
P7).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=8,
                    help="virtual CPU device count (0 = use real devices)")
    ap.add_argument("--distributed", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nproc", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--mesh-sizes", default="",
                    help="comma list; default = powers of 2 up to #devices")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--dump-image", default="",
                    help="write the allgathered frame (.npy, pid 0 only)")
    args = ap.parse_args()

    if args.virtual:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.virtual}"
            ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")
    if args.distributed:
        from se195_raytracer_tpu.parallel.render_sharded import (
            initialize_multihost,
        )

        initialize_multihost(args.coordinator, args.nproc, args.pid)

    import numpy as np

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.parallel.mesh import make_mesh
    from se195_raytracer_tpu.parallel.render_sharded import render_sharded
    from se195_raytracer_tpu.scenes.registry import get_scene

    devices = jax.devices()
    n_dev = len(devices)
    multiprocess = jax.process_count() > 1
    if args.mesh_sizes:
        sizes = [int(s) for s in args.mesh_sizes.split(",")]
    else:
        if multiprocess:
            # Every computation must span all processes (a mesh that
            # excludes a process's devices cannot be driven SPMD), so
            # the only default size is the full global mesh.
            sizes = [n_dev]
        else:
            sizes = []
            k = 1
            while k <= n_dev:
                sizes.append(k)
                k *= 2

    spec = get_scene(args.scene)
    scene, cam = spec.to_scene(), spec.to_camera()
    cfg = RenderConfig(width=args.width, height=args.height, spp=args.spp,
                       seed=0)
    rays = args.width * args.height * args.spp

    if multiprocess:
        from jax.experimental import multihost_utils

        def fetch(x):
            # A multi-process global array is not fully addressable;
            # the cross-process frame assembly is an explicit
            # allgather (the DCN analogue of the readback,
            # smallptGPU.cpp:760-773).
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
    else:
        fetch = np.asarray

    rows = []
    ref_img = None
    last_img = None
    for k in sizes:
        mesh = make_mesh(devices[:k])
        state_box = {}

        def run():
            img, st = render_sharded(
                scene, cam, cfg, mesh=mesh, state=state_box.get("st")
            )
            state_box["st"] = st
            return img

        img = fetch(run())  # compile + warm
        last_img = img
        if ref_img is None:
            ref_img = img
            bitwise = True
        else:
            bitwise = bool(np.array_equal(ref_img, img))
        best = float("inf")
        for _ in range(args.reps):
            state_box.pop("st")  # fresh accumulation each rep
            t0 = time.perf_counter()
            fetch(run())
            best = min(best, time.perf_counter() - t0)
        rows.append({
            "mesh_devices": k,
            "elapsed_s": round(best, 4),
            "rays_per_sec": round(rays / best, 1),
            "bitwise_equal_to_1dev": bitwise,
        })
        if jax.process_index() == 0:
            print(json.dumps(rows[-1]), flush=True)

    if args.dump_image and jax.process_index() == 0:
        np.save(args.dump_image, last_img)

    base = rows[0]["rays_per_sec"]
    for r in rows:
        r["speedup_vs_1dev"] = round(r["rays_per_sec"] / base, 3)
        if args.distributed and not args.virtual:
            # Real chips: per-chip parallel efficiency, the >=85% target.
            r["efficiency"] = round(r["speedup_vs_1dev"] / r["mesh_devices"], 3)
        else:
            # Virtual CPU devices timeshare the same host cores: total
            # compute capacity is CONSTANT across mesh sizes, so the
            # ideal is speedup 1.0x and any shortfall is pure sharding-
            # harness overhead (shard_map dispatch + assembly), NOT a
            # parallel-efficiency number. Dividing by mesh size would
            # be meaningless here. SIGNED on purpose: a negative
            # overhead (speedup > 1) flags measurement noise or a slow
            # 1-device baseline rather than hiding it behind a clamp.
            r["harness_overhead_pct"] = round(
                (1.0 - r["speedup_vs_1dev"]) * 100.0, 1
            )

    out = {
        "mode": ("distributed-virtual-cpu" if args.distributed and args.virtual
                 else "distributed" if args.distributed
                 else f"virtual-cpu-{args.virtual}"),
        "note": (
            "2 OS processes over a localhost jax.distributed coordinator, "
            "each owning virtual CPU devices — exercises the REAL "
            "multi-process path (global mesh spanning processes, "
            "cross-process allgather assembly); throughput is NOT a chip "
            "scaling number (devices timeshare host cores). Bitwise "
            "equality with a single-process render is pinned by "
            "tests/test_multihost.py."
        ) if args.distributed and args.virtual else None,
        "platform": jax.default_backend(),
        "n_processes": jax.process_count(),
        # Virtual devices beyond the physical core count timeshare: on an
        # M-core host, mesh sizes > M necessarily regress wall-clock (the
        # r3 8-device 0.727x was exactly this on host_cpus=2).
        "host_cpus": os.cpu_count(),
        "workload": {
            "scene": args.scene, "width": args.width,
            "height": args.height, "spp": args.spp,
        },
        "all_bitwise_invariant": all(
            r["bitwise_equal_to_1dev"] for r in rows
        ),
        "results": rows,
    }
    if args.out and jax.process_index() == 0:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.out}")
    if jax.process_index() == 0:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
