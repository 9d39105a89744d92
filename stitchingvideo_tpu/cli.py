"""CLI mirroring the reference's flag set.

Parity target: the reference CLI (stitching_detailed.cpp printUsage :64-119,
parseCmdArgs :145-326) so its .bat scenarios translate 1:1, e.g.
RunTest2.bat's `OpenCV2.4.11-Stitching img1..img6` ->
`tpu-stitch stitch img1..img6`, plus a `video` subcommand for the RT-driver
mode the reference compiles constants for.
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def _build_cfg(args) -> "StitchConfig":
    from .config import StitchConfig
    cfg = StitchConfig()
    cfg = cfg.replace(
        scales=dataclasses.replace(
            cfg.scales, work_megapix=args.work_megapix,
            seam_megapix=args.seam_megapix, compose_megapix=args.compose_megapix),
        features=dataclasses.replace(
            cfg.features, kind=args.features),
        match=dataclasses.replace(cfg.match, match_conf=args.match_conf),
        register=dataclasses.replace(
            cfg.register, conf_thresh=args.conf_thresh, ba_kind=args.ba,
            ba_refine_mask=args.ba_refine_mask,
            wave_correct=None if args.wave_correct == "no" else args.wave_correct),
        compose=dataclasses.replace(
            cfg.compose, warp_type=args.warp, seam_find=args.seam,
            expos_comp=args.expos_comp, blend_type=args.blend,
            blend_strength=args.blend_strength),
    )
    return cfg


def _add_common(p: argparse.ArgumentParser) -> None:
    # flag names/defaults follow the reference CLI (:122-143)
    p.add_argument("--work_megapix", type=float, default=0.6)
    p.add_argument("--seam_megapix", type=float, default=0.1)
    p.add_argument("--compose_megapix", type=float, default=-1.0)
    p.add_argument("--features", choices=["orb", "harris_brief"], default="orb")
    p.add_argument("--match_conf", type=float, default=0.3)
    p.add_argument("--conf_thresh", type=float, default=1.0)
    p.add_argument("--ba", choices=["no", "reproj", "ray"], default="ray")
    p.add_argument("--ba_refine_mask", default="xxxxx")
    p.add_argument("--wave_correct", choices=["no", "horiz", "vert"],
                   default="horiz")
    p.add_argument("--warp", default="spherical",
                   help="plane|cylindrical|spherical|fisheye|stereographic|"
                        "compressedPlaneA2B1|...|mercator|transverseMercator")
    p.add_argument("--seam", choices=["no", "voronoi", "gc_color", "gc_colorgrad",
                                      "dp_color", "dp_colorgrad"],
                   default="gc_color")
    p.add_argument("--expos_comp", choices=["no", "gain", "gain_blocks"],
                   default="gain_blocks")
    p.add_argument("--blend", choices=["no", "feather", "multiband"],
                   default="multiband")
    p.add_argument("--blend_strength", type=float, default=5.0)
    p.add_argument("--save_graph", default=None,
                   help="write DOT match graph to this file")
    p.add_argument("--output", default="result.jpg")
    p.add_argument("--log_timing", action="store_true",
                   help="print per-stage timing JSON (reference resultTime.txt parity)")


def _load_images(paths):
    import imageio.v3 as iio
    return [np.asarray(iio.imread(p))[..., :3] for p in paths]


def cmd_stitch(args) -> int:
    from .models.stitcher import Stitcher
    cfg = _build_cfg(args)
    images = _load_images(args.images)
    st = Stitcher(cfg)
    t0 = time.perf_counter()
    # stitch() routes through the OpenCV-faithful compose path by default
    # (cfg.compose.faithful) — the PSNR-parity still pipeline
    pano, mask = st.stitch(images)
    t1 = time.perf_counter()
    print(f"stitched in {t1 - t0:.2f}s, pano {pano.shape[1]}x{pano.shape[0]}")
    if args.save_graph:
        from .register.graph import matches_graph_dot
        names = [str(p) for p in args.images]
        dot = matches_graph_dot(names, st._last_result.pair_stats,
                                args.conf_thresh)
        with open(args.save_graph, "w") as f:
            f.write(dot)
    import imageio.v3 as iio
    iio.imwrite(args.output, pano)
    print(f"wrote {args.output}")
    if args.log_timing:
        from .utils.timing import GLOBAL_TRACER
        print(GLOBAL_TRACER.dumps())
    return 0


def cmd_video(args) -> int:
    from .video.runtime import VideoStitcher
    from .video.sources import DirectorySource, ReplaySource, VideoFileSource
    cfg = _build_cfg(args)
    cfg = cfg.replace(video=dataclasses.replace(
        cfg.video, reregister_seconds=args.reregister_seconds))
    if getattr(args, "canvas_shards", 1) > 1:
        cfg = cfg.replace(parallel=dataclasses.replace(
            cfg.parallel, canvas_shards=args.canvas_shards))
    if args.mode == "replay":
        src = ReplaySource(_load_images(args.inputs), jitter=2)
    elif args.mode == "dirs":
        src = DirectorySource(args.inputs, loop=True)
    else:
        src = VideoFileSource(args.inputs)
    vs = VideoStitcher(cfg)
    if args.output:
        import imageio.v3 as iio

        def on_frame(pano, i):
            if i == 0:
                iio.imwrite(args.output, pano)
    else:
        on_frame = None
    stats = vs.run(src, on_frame=on_frame, max_frames=args.frames)
    print(f"frames: {stats.frames}, fps: {stats.fps():.1f}, "
          f"registrations: {vs.registrations}")
    if args.log_timing:
        from .utils.timing import GLOBAL_TRACER
        print(GLOBAL_TRACER.dumps())
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="tpu-stitch",
        description="TPU-native panorama/video stitcher "
                    "(reference-compatible flags)")
    sub = parser.add_subparsers(dest="command", required=True)

    ps = sub.add_parser("stitch", help="batch still-image panorama "
                                       "(reference CLI mode)")
    ps.add_argument("images", nargs="+")
    _add_common(ps)
    ps.set_defaults(func=cmd_stitch)

    pv = sub.add_parser("video", help="real-time streaming mode "
                                      "(reference 64-bit driver mode)")
    pv.add_argument("inputs", nargs="+",
                    help="images (replay), directories, or video files/URLs")
    pv.add_argument("--mode", choices=["replay", "dirs", "videos"],
                    default="replay")
    pv.add_argument("--frames", type=int, default=100)
    pv.add_argument("--reregister_seconds", type=float, default=30.0)
    pv.add_argument("--canvas_shards", type=int, default=1,
                    help="shard the panorama in row bands over this many "
                         "chips (jax.sharding mesh; hot loop stays "
                         "collective-free)")
    _add_common(pv)
    pv.set_defaults(func=cmd_video)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
