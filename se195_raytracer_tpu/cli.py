"""Command-line interface.

Replaces the reference's CLI surface (SURVEY.md §2a: ``smallptGPU
<useGPU> <wgSize> <kernel> <w> <h> <scene>`` from the RUN_SCENE_*.bat
launchers, smallptGPU.cpp:836-854) with subcommands:

    se195-render render --scene cornell --width 512 --height 512 --spp 8 \
        --integrator pt --out out.png
    se195-render bench --scene cornell --width 512 --height 512 --spp 8
    se195-render scenes
"""

from __future__ import annotations

import argparse
import json
import sys
import time


# Per-integrator default scene (reference defaults: Cornell for smallpt,
# the 17-prim room for 3.2.0x, Scene::InitScene's room for raytracer5).
DEFAULT_SCENE = {"pt": "cornell", "dl": "cornell", "whitted": "room", "whitted5": "room5"}


def _add_render_args(p: argparse.ArgumentParser):
    p.add_argument(
        "--scene",
        default=None,
        help="registry name or .scn path (default: per-integrator — "
        "cornell / room / room5)",
    )
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--spp", type=int, default=8)
    p.add_argument("--max-depth", type=int, default=7)
    p.add_argument(
        "--integrator",
        choices=["pt", "dl", "whitted", "whitted5"],
        default="pt",
        help="pt=RadiancePathTracing, dl=RadianceDirectLighting, "
        "whitted=ray-queue Whitted (3.2.0x), whitted5=extended Whitted "
        "(area lights/boxes/glossy/textures, raytracer5)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ray-tile", type=int, default=None)
    p.add_argument(
        "--pallas",
        action=argparse.BooleanOptionalAction,
        default=None,
        help="use the fused Pallas TPU kernel (fast path); defaults to ON "
        "when the JAX backend is a TPU, OFF otherwise (--no-pallas forces "
        "the XLA path)",
    )
    p.add_argument(
        "--supersample", type=int, default=3,
        help="whitted: subpixel rays per axis (reference 3x3, "
        "raytracer_kernel.cl:291-292)",
    )
    p.add_argument(
        "--trace-depth", type=int, default=5,
        help="whitted: reflect/refract tree depth (TRACEDEPTH 5, "
        "raytracer_kernel.cl:8)",
    )
    p.add_argument(
        "--hit-bias", type=float, default=0.0,
        help="whitted: 3.2.03 sphere near-hit slack (0.005 for kernel "
        "parity, raytracer_kernel.cl:128); default 0 = 3.2.02/CPU",
    )
    p.add_argument(
        "--adaptive",
        action="store_true",
        help="whitted5 only: adaptive 1-vs-4-ray supersampling "
        "(raytracer5 Engine::Render, raytracer.cpp:481-535)",
    )
    p.add_argument(
        "--soft", type=float, default=0.0, metavar="W",
        help="differentiable-visibility relaxation width in world units "
        "(0 = reference-hard estimator). pt/dl: softens emissive-hit and "
        "shadow indicators (models/smallpt.py); whitted5: softens the "
        "CalcShade shadow visibility (area-light silhouette gradients). "
        "Runs on the jnp path — the Pallas kernels implement the hard "
        "estimator, and the relaxation must be identical in forward and "
        "backward for FD/autodiff consistency",
    )
    p.add_argument(
        "--profile",
        default="",
        metavar="DIR",
        help="capture a jax.profiler trace of the render into DIR "
        "(view with TensorBoard/Perfetto)",
    )


def _load_scene(name: str):
    import os

    from se195_raytracer_tpu.scenes.parser import load_scn
    from se195_raytracer_tpu.scenes.registry import SCENES, get_scene, list_scenes

    if name in SCENES:
        return get_scene(name)
    if os.path.exists(name):
        return load_scn(name)
    sys.exit(
        f"error: unknown scene {name!r} — not a registry name "
        f"({', '.join(list_scenes())}) and no such file"
    )


def _whitted_scene(args):
    """Resolve --scene for the whitted (3.2.0x) family; error on unknown."""
    from se195_raytracer_tpu.scenes.whitted_scenes import WHITTED_SCENES

    if args.scene not in WHITTED_SCENES:
        sys.exit(
            f"error: unknown whitted scene {args.scene!r} "
            f"(known: {', '.join(sorted(WHITTED_SCENES))})"
        )
    return WHITTED_SCENES[args.scene]()


def _whitted5_scene(args):
    """Resolve --scene for the whitted5 (raytracer5) family; error on unknown."""
    from se195_raytracer_tpu.scenes.whitted5_scenes import WHITTED5_SCENES

    if args.scene not in WHITTED5_SCENES:
        sys.exit(
            f"error: unknown whitted5 scene {args.scene!r} "
            f"(known: {', '.join(sorted(WHITTED5_SCENES))})"
        )
    return WHITTED5_SCENES[args.scene]()


def cmd_render(args) -> int:
    import numpy as np

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.io.image import write_image
    from se195_raytracer_tpu.ops.tonemap import to_int_np

    use_pallas = args.pallas
    if args.soft > 0.0 and use_pallas is not False:
        # The relaxation runs on the jnp path (see --soft help).
        if use_pallas:
            print("--soft: using the jnp path (kernels implement the "
                  "hard estimator)", file=sys.stderr)
        use_pallas = False
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        spp=args.spp,
        max_depth=args.max_depth,
        integrator=args.integrator if args.integrator in ("pt", "dl") else "pt",
        seed=args.seed,
        ray_tile=args.ray_tile,
        use_pallas=use_pallas,
        supersample=args.supersample,
        trace_depth=args.trace_depth,
        hit_bias=args.hit_bias,
        soft_edges=args.soft,
    )
    from se195_raytracer_tpu.utils.profiling import maybe_trace

    t0 = time.perf_counter()
    with maybe_trace(args.profile):
        if args.integrator == "whitted":
            from se195_raytracer_tpu.models.whitted import render_whitted

            img = np.asarray(render_whitted(_whitted_scene(args), cfg))
            img_u8 = np.clip(img, 0, 255).astype(np.uint8)
        elif args.integrator == "whitted5":
            from se195_raytracer_tpu.models.whitted5 import (
                render_whitted5,
                render_whitted5_adaptive,
            )

            scene5 = _whitted5_scene(args)
            if args.adaptive:
                img, frac = render_whitted5_adaptive(
                    scene5, width=args.width, height=args.height,
                    seed=args.seed, use_pallas=args.pallas,
                )
                img = np.asarray(img)
                print(
                    f"adaptive supersampling: {frac * 100:.1f}% edge pixels "
                    "got 4 rays",
                    file=sys.stderr,
                )
            else:
                kw5 = {}
                if args.pallas and args.soft == 0.0:
                    from se195_raytracer_tpu.kernels.whitted5_kernel import (
                        render_whitted5_pallas,
                    )

                    fn5 = render_whitted5_pallas
                else:
                    fn5 = render_whitted5
                    if args.soft > 0.0:
                        kw5["soft_edges"] = args.soft
                img = np.asarray(
                    fn5(
                        scene5, width=args.width, height=args.height,
                        spp=args.spp, seed=args.seed, **kw5,
                    )
                )
            img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
        else:
            spec = _load_scene(args.scene)
            img, _ = render(spec.to_scene(), spec.to_camera(), cfg)
            img = np.asarray(img)
            img_u8 = to_int_np(img).astype(np.uint8)
    elapsed = time.perf_counter() - t0
    rays = args.width * args.height * args.spp
    print(
        f"rendered {args.scene} {args.width}x{args.height} spp={args.spp} "
        f"in {elapsed:.3f}s ({rays / elapsed / 1e3:.1f}K samples/sec)",
        file=sys.stderr,
    )
    if args.out:
        write_image(img_u8, args.out)
        print(f"wrote {args.out}", file=sys.stderr)
    return 0


def _bench_whitted(args) -> int:
    """Benchmark the Whitted families (3.2.0x queue tracer at 3x3
    supersampling like the reference's 800x600 workload, or the raytracer5
    tracer), printing the same JSON shape as the smallpt bench."""
    import jax
    import numpy as np

    if args.integrator == "whitted":
        scene = _whitted_scene(args)
        supersample = args.supersample
        kw = dict(
            width=args.width, height=args.height,
            supersample=args.supersample, trace_depth=args.trace_depth,
            hit_bias=args.hit_bias,
        )
        if args.pallas:
            from se195_raytracer_tpu.kernels.whitted_kernel import (
                render_whitted_pallas,
            )

            run = lambda: render_whitted_pallas(scene, **kw)
        else:
            from se195_raytracer_tpu.models.whitted import render_whitted_scene

            run = lambda: render_whitted_scene(scene, **kw)
    else:
        scene = _whitted5_scene(args)
        supersample = 1 if not args.adaptive else 2
        from se195_raytracer_tpu.models.whitted5 import (
            render_whitted5,
            render_whitted5_adaptive,
        )

        if args.adaptive:
            run = lambda: render_whitted5_adaptive(
                scene, width=args.width, height=args.height, seed=args.seed
            )[0]
        else:
            run = lambda: render_whitted5(
                scene, width=args.width, height=args.height, spp=args.spp,
                seed=args.seed,
            )
    np.asarray(run())  # compile + warm
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        np.asarray(run())
        best = min(best, time.perf_counter() - t0)
    rays = args.width * args.height * supersample * supersample
    print(
        json.dumps(
            {
                "scene": args.scene,
                "width": args.width,
                "height": args.height,
                "supersample": supersample,
                "integrator": args.integrator,
                "device": str(jax.devices()[0]),
                "elapsed_s": round(best, 4),
                "rays_per_sec": round(rays / best, 1),
            }
        )
    )
    return 0


def cmd_bench(args) -> int:
    import jax
    import numpy as np

    from se195_raytracer_tpu.core.config import RenderConfig
    from se195_raytracer_tpu.driver.render import render
    from se195_raytracer_tpu.utils.profiling import maybe_trace

    if args.integrator in ("whitted", "whitted5"):
        return _bench_whitted(args)
    spec = _load_scene(args.scene)
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        spp=args.spp,
        max_depth=args.max_depth,
        integrator="dl" if args.integrator == "dl" else "pt",
        seed=args.seed,
        ray_tile=args.ray_tile,
        use_pallas=args.pallas,
    )
    scene, camera = spec.to_scene(), spec.to_camera()
    # Sync via host fetch: block_until_ready does not reliably block on
    # the axon (tunneled-TPU) platform.
    img, state = render(scene, camera, cfg)
    np.asarray(img)
    best = float("inf")
    with maybe_trace(args.profile):
        for _ in range(args.reps):
            t0 = time.perf_counter()
            img, state = render(scene, camera, cfg, state=state)
            np.asarray(img)
            best = min(best, time.perf_counter() - t0)
    rays = args.width * args.height * args.spp
    print(
        json.dumps(
            {
                "scene": args.scene,
                "width": args.width,
                "height": args.height,
                "spp": args.spp,
                "integrator": args.integrator,
                "device": str(jax.devices()[0]),
                "elapsed_s": round(best, 4),
                "rays_per_sec": round(rays / best, 1),
            }
        )
    )
    return 0


def cmd_scenes(_args) -> int:
    from se195_raytracer_tpu.scenes.registry import list_scenes

    for name in list_scenes():
        print(name)
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="se195-render")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("render", help="render a scene to an image file")
    _add_render_args(p)
    p.add_argument("--out", default="out.png", help=".png/.ppm/.bmp path ('' to skip)")
    p.set_defaults(fn=cmd_render)

    p = sub.add_parser("bench", help="benchmark a workload, print JSON")
    _add_render_args(p)
    p.add_argument("--reps", type=int, default=3)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("scenes", help="list built-in scenes")
    p.set_defaults(fn=cmd_scenes)

    args = parser.parse_args(argv)
    if getattr(args, "scene", None) is None and hasattr(args, "integrator"):
        args.scene = DEFAULT_SCENE[args.integrator]
    from se195_raytracer_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    if getattr(args, "pallas", None) is None and hasattr(args, "integrator"):
        # Auto: the fused kernels are the fast path on TPU; the XLA path
        # remains the default on CPU (and the interpret-mode test target).
        import jax

        args.pallas = jax.default_backend() not in ("cpu",)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
