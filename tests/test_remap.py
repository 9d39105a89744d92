"""remap vs cv2.remap for all interp/border combinations used by the pipeline."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from stitchingvideo_tpu.ops.remap import remap  # noqa: E402

_BORDER_CV = {
    "constant": cv2.BORDER_CONSTANT,
    "replicate": cv2.BORDER_REPLICATE,
    "reflect": cv2.BORDER_REFLECT,
    "reflect101": cv2.BORDER_REFLECT_101,
    "wrap": cv2.BORDER_WRAP,
}


def _maps(rng, h, w, out_h, out_w, overshoot=20.0):
    xmap = rng.uniform(-overshoot, w + overshoot, (out_h, out_w)).astype(np.float32)
    ymap = rng.uniform(-overshoot, h + overshoot, (out_h, out_w)).astype(np.float32)
    return xmap, ymap


@pytest.mark.parametrize("border", ["constant", "replicate", "reflect", "reflect101", "wrap"])
@pytest.mark.parametrize("interp", ["linear", "nearest"])
def test_remap_matches_cv2_float(border, interp, rng):
    img = rng.uniform(0, 255, (37, 53, 3)).astype(np.float32)
    xmap, ymap = _maps(rng, 37, 53, 41, 29)
    cv_interp = cv2.INTER_LINEAR if interp == "linear" else cv2.INTER_NEAREST
    ref = cv2.remap(img, xmap, ymap, cv_interp, borderMode=_BORDER_CV[border])
    ours = np.asarray(remap(img, xmap, ymap, interp=interp, border=border))
    if interp == "nearest":
        # rounding of exact .5 coords can differ; allow tiny fraction of mismatches
        frac_bad = (np.abs(ours - ref) > 1e-3).mean()
        assert frac_bad < 0.02, frac_bad
    else:
        np.testing.assert_allclose(ours, ref, atol=0.25)


def test_remap_uint8_identity(rng):
    img = rng.integers(0, 255, (16, 24), np.uint8)
    ys, xs = np.mgrid[0:16, 0:24].astype(np.float32)
    out = np.asarray(remap(img, xs, ys, interp="linear", border="constant"))
    np.testing.assert_array_equal(out, img)


def test_remap_grad():
    """remap must be differentiable w.r.t. the image (needed for BA variants)."""
    import jax
    import jax.numpy as jnp
    img = jnp.arange(12.0).reshape(3, 4)
    xmap = jnp.array([[0.5, 1.5]])
    ymap = jnp.array([[0.5, 1.0]])
    g = jax.grad(lambda im: remap(im, xmap, ymap).sum())(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(g.sum()) == pytest.approx(2.0)
