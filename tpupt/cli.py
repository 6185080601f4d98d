"""CLI mirroring the reference binary (main.rs:620-645).

Usage: python -m tpupt.cli -s 3            # fast mode: 600 px, 100 spp
       python -m tpupt.cli -s 3 -q         # quality mode: 1920 px, 4000 spp
       python -m tpupt.cli -s 3 --width 300 --spp 16 -o out/cornell.png
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description="tpupt: TPU-native path tracer")
    ap.add_argument("-q", "--quality", action="store_true", help="1920 px / 4000 spp preset")
    ap.add_argument("-s", "--scene", type=int, default=1, help="scene number 1-7")
    ap.add_argument("--width", type=int, default=None, help="override image width")
    ap.add_argument("--spp", type=int, default=None, help="override samples per pixel")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--output", type=str, default=None)
    ap.add_argument("--rays-per-launch", type=int, default=1 << 20)
    ap.add_argument(
        "--checkpoint",
        type=str,
        default=None,
        help="film checkpoint file: saved after every launch, resumed if present "
        "(bit-identical to an uninterrupted render)",
    )
    ap.add_argument(
        "--profile",
        type=str,
        default=None,
        metavar="DIR",
        help="write a jax.profiler trace of the render to DIR (view with XProf)",
    )
    ap.add_argument(
        "--debug-checks",
        action="store_true",
        help="validate every launch's film for NaN/Inf and fail loudly",
    )
    ap.add_argument(
        "--hdr-env",
        action="store_true",
        help="full-f32 HDR environment + importance sampling (scenes 4 and 7; "
        "new capability — the reference quantizes .hdr maps to u8)",
    )
    ap.add_argument(
        "--mesh",
        type=int,
        default=None,
        metavar="N",
        help="scale the render over an N-device jax.sharding.Mesh (sample axis "
        "sharded; film psum-reduced per launch). Requires N visible devices.",
    )
    args = ap.parse_args(argv)

    width, spp = (1920, 4000) if args.quality else (600, 100)  # main.rs:633
    if args.width is not None:
        width = args.width
    if args.spp is not None:
        spp = args.spp

    from .io.image import save_png
    from .render.renderer import render_image
    from .scenes import SCENES

    if args.scene not in SCENES:
        print(f"unknown scene {args.scene}; choose from {sorted(SCENES)}")
        return 1

    # persistent XLA compile cache: TPU programs take minutes to compile through
    # this environment's remote compile service; cached loads are sub-second
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("TPUPT_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # config frozen after backend init; cache is best-effort

    name, build = SCENES[args.scene]
    out_path = args.output or os.path.join("out", f"{name}.png")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    print(f"scene {args.scene} ({name}): {width}px, {spp} spp")
    import inspect

    kwargs = {}
    if args.hdr_env:
        if "hdr_env" not in inspect.signature(build).parameters:
            print(f"--hdr-env: scene {args.scene} has no environment map; ignoring")
        else:
            kwargs["hdr_env"] = True
    mesh = None
    if args.mesh is not None:
        from .parallel.sharding import make_mesh

        mesh = make_mesh(args.mesh)

    scene, camera = build(width, spp, **kwargs)
    compiled = scene.compile()
    img, _, stats = render_image(
        compiled,
        camera,
        seed=args.seed,
        rays_per_launch=args.rays_per_launch,
        checkpoint_path=args.checkpoint,
        profile_dir=args.profile,
        debug_checks=args.debug_checks,
        mesh=mesh,
    )
    save_png(out_path, img)
    print(
        f"rendered {stats.paths} paths in {stats.wall_s:.2f}s "
        f"({stats.paths_per_s / 1e6:.2f} Mpaths/s) -> {out_path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
