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


@pytest.mark.slow
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


@pytest.mark.slow
def test_cli_video(scene_files, tmp_path):
    d, paths = scene_files
    out = tmp_path / "frame0.png"
    rc = main(["video", *paths, "--mode", "replay", "--frames", "3",
               "--warp", "cylindrical", "--seam", "voronoi",
               "--expos_comp", "no", "--blend", "no",
               "--conf_thresh", "0.6", "--output", str(out)])
    assert rc == 0
    assert out.exists()


@pytest.mark.slow
def test_cli_video_shm_mode(scene_files, tmp_path):
    """Reference RT scenario from the CLI: decode producers spawned by the
    driver (--mode shm) feeding the shared-memory rings."""
    import cv2
    d, paths = scene_files
    vids = []
    for i, p in enumerate(paths):
        img = iio.imread(p)
        vp = str(tmp_path / f"cam{i}.avi")
        w = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 15.0,
                            (img.shape[1], img.shape[0]))
        assert w.isOpened()
        for _ in range(30):
            w.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        w.release()
        vids.append(vp)
    out = tmp_path / "out.mp4"
    rc = main(["video", *vids, "--mode", "shm", "--frames", "2",
               "--warp", "cylindrical", "--seam", "voronoi",
               "--expos_comp", "no", "--blend", "no",
               "--conf_thresh", "0.6", "--output", str(out)])
    assert rc == 0
    # the stitched STREAM must come out: decode it back and check content
    cap = cv2.VideoCapture(str(out))
    assert cap.isOpened()
    decoded = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        decoded.append(fr)
    cap.release()
    assert len(decoded) == 2
    assert decoded[0].shape[1] > 500
    for fr in decoded:
        assert (fr > 16).mean() > 0.2   # real image content, not black


@pytest.mark.slow
def test_cli_video_mp4_and_registration_persistence(scene_files, tmp_path):
    """`video --output out.mp4` writes EVERY composed frame; a second run
    restarts from --load_registration with no re-registration (VERDICT r2
    items 4+7; reference imshow loop 64-bit driver :762-768 and the unwired
    camera-mp4.yml persistence intent, SURVEY §5.4)."""
    import cv2
    d, paths = scene_files
    out = tmp_path / "pano.mp4"
    regp = tmp_path / "reg.npz"
    rc = main(["video", *paths, "--mode", "replay", "--frames", "4",
               "--warp", "cylindrical", "--seam", "voronoi",
               "--expos_comp", "no", "--blend", "no", "--conf_thresh", "0.6",
               "--output", str(out), "--save_registration", str(regp)])
    assert rc == 0
    assert regp.exists()
    cap = cv2.VideoCapture(str(out))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 4

    # restart from the checkpoint: composes without a registration pass
    out2 = tmp_path / "pano2.mp4"
    rc = main(["video", *paths, "--mode", "replay", "--frames", "2",
               "--warp", "cylindrical", "--seam", "voronoi",
               "--expos_comp", "no", "--blend", "no", "--conf_thresh", "0.6",
               "--output", str(out2), "--load_registration", str(regp)])
    assert rc == 0
    cap = cv2.VideoCapture(str(out2))
    ok, fr = cap.read()
    cap.release()
    assert ok and (fr > 16).mean() > 0.2


@pytest.mark.slow
def test_cli_preview_and_undistort_flags(scene_files, tmp_path):
    """--preview composes at 0.6 MP (reference :319-322); --undistort_params
    parses; --try_gpu accepted for flag parity."""
    d, paths = scene_files
    out = tmp_path / "pano.png"
    rc = main(["stitch", *paths, "--warp", "cylindrical", "--seam", "voronoi",
               "--expos_comp", "no", "--blend", "feather", "--preview",
               "--try_gpu", "no", "--conf_thresh", "0.6",
               "--output", str(out)])
    assert rc == 0
    full = iio.imread(tmp_path / "pano.png")
    # 3x(384x288) inputs are ~0.11 MP each: preview caps compose at 0.6 MP
    # total, so the pano must be smaller than full-res compose would give
    assert full.shape[1] > 300

    from stitchingvideo_tpu.cli import _build_cfg
    import argparse
    ns = argparse.Namespace(
        work_megapix=0.6, seam_megapix=0.1, compose_megapix=-1.0,
        features="orb", match_conf=0.3, conf_thresh=1.0, ba="ray",
        ba_refine_mask="xxxxx", wave_correct="horiz", warp="spherical",
        seam="gc_color", expos_comp="gain_blocks", blend="multiband",
        blend_strength=5.0, preview=False, undistort=True,
        undistort_params="100,101,50,51,-0.1,0.01,0.001,0.002")
    cfg = _build_cfg(ns)
    assert cfg.undistort.enabled
    assert cfg.undistort.fx == 100 and cfg.undistort.cy == 51
    assert cfg.undistort.dist == (-0.1, 0.01, 0.001, 0.002)


def test_display_sink_key_callback(monkeypatch):
    """DisplaySink forwards keypresses (the reference's 'a'-key on-demand
    re-registration, 64-bit driver :768) and make_sink wires on_key through.
    cv2's GUI is faked so the test runs headless."""
    import types

    from stitchingvideo_tpu.video import sink as sink_mod

    shown, keys = [], [ord("a"), -1, ord("q")]
    fake = types.SimpleNamespace(
        imshow=lambda title, img: shown.append((title, img.shape)),
        waitKey=lambda ms: keys.pop(0),
        destroyWindow=lambda title: None,
        cvtColor=lambda img, code: img,
        COLOR_RGB2BGR=4,
    )
    monkeypatch.setitem(sys.modules, "cv2", fake)

    pressed = []
    s = sink_mod.make_sink(None, display=True, on_key=pressed.append)
    frame = np.zeros((8, 8, 3), np.uint8)
    for i in range(3):
        s.write(frame, i)
    s.close()
    assert s.frames_written == 3
    assert len(shown) == 3
    assert pressed == [ord("a"), ord("q")]  # -1 (no key) filtered out


def test_sink_routing_and_edges(tmp_path):
    """make_sink routes by extension; VideoFileSink rejects a mid-stream
    frame-size change (an encoder cannot resize); StillSink keeps only the
    first frame; TeeSink fans out and counts once."""
    import imageio.v3 as iio

    from stitchingvideo_tpu.video import sink as sm

    f1 = np.full((32, 48, 3), 10, np.uint8)
    f2 = np.full((32, 48, 3), 200, np.uint8)

    s = sm.make_sink(str(tmp_path / "frames_dir"))
    assert isinstance(s, sm.FrameDirSink)
    s.write(f1, 0); s.write(f2, 1); s.close()
    assert sorted(p.name for p in (tmp_path / "frames_dir").iterdir()) == \
        ["frame_000000.jpg", "frame_000001.jpg"]

    still = sm.make_sink(str(tmp_path / "one.png"))
    assert isinstance(still, sm.StillSink)
    still.write(f1, 0); still.write(f2, 1); still.close()
    assert still.frames_written == 1
    assert iio.imread(tmp_path / "one.png").mean() < 50   # first frame only

    vid = sm.make_sink(str(tmp_path / "out.avi"))
    assert isinstance(vid, sm.VideoFileSink)
    vid.write(f1, 0)
    with pytest.raises(ValueError, match="frame size changed"):
        vid.write(np.zeros((16, 48, 3), np.uint8), 1)
    vid.close()

    tee = sm.TeeSink(sm.StillSink(str(tmp_path / "t.png")),
                     sm.FrameDirSink(str(tmp_path / "t_dir")))
    tee.write(f1, 0); tee.write(f2, 1); tee.close()
    assert tee.frames_written == 2
