"""CLI end-to-end: stitch + video subcommands on synthetic scenes."""
import sys

import numpy as np
import pytest

import imageio.v3 as iio

from stitchingvideo_tpu.cli import main
from stitchingvideo_tpu.utils import synthetic


@pytest.fixture(scope="module")
def scene_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    views, *_ = synthetic.make_scene(n=3, img_wh=(384, 288), fov_deg=55,
                                     overlap_frac=0.4, seed=9)
    paths = []
    for i, v in enumerate(views):
        p = d / f"cam{i}.png"
        iio.imwrite(p, v)
        paths.append(str(p))
    return d, paths


def test_cli_stitch(scene_files, tmp_path):
    d, paths = scene_files
    out = tmp_path / "pano.png"
    graph = tmp_path / "graph.dot"
    rc = main(["stitch", *paths, "--warp", "cylindrical", "--seam", "voronoi",
               "--expos_comp", "no", "--blend", "feather",
               "--conf_thresh", "0.6",
               "--save_graph", str(graph), "--output", str(out)])
    assert rc == 0
    pano = iio.imread(out)
    assert pano.shape[1] > 500
    dot = graph.read_text()
    assert dot.startswith("graph matches_graph{")
    assert "Nm=" in dot


def test_cli_video(scene_files, tmp_path):
    d, paths = scene_files
    out = tmp_path / "frame0.png"
    rc = main(["video", *paths, "--mode", "replay", "--frames", "3",
               "--warp", "cylindrical", "--seam", "voronoi",
               "--expos_comp", "no", "--blend", "no",
               "--conf_thresh", "0.6", "--output", str(out)])
    assert rc == 0
    assert out.exists()
