"""Camera model as a struct-of-arrays pytree.

Parity target: `cv::detail::CameraParams{focal, aspect, ppx, ppy, R, t}` and its
`K()` builder (reference src/camera.cpp:50-73, include/.../camera.hpp:51-66) —
but batched over the camera axis so every geometric stage vmaps/shards cleanly.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Cameras:
    """N pinhole cameras under the rotation-only model.

    focal:  [N]      focal length in px
    aspect: [N]      fy = focal * aspect
    ppx:    [N]      principal point x
    ppy:    [N]      principal point y
    R:      [N,3,3]  rotation world->..? (OpenCV stitching convention: ray_pano = R @ K^-1 @ p)
    t:      [N,3]    translation (always 0 in the rotation model; kept for parity)
    """
    focal: jnp.ndarray
    aspect: jnp.ndarray
    ppx: jnp.ndarray
    ppy: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray

    @property
    def n(self) -> int:
        return self.focal.shape[0]

    def K(self) -> jnp.ndarray:
        """[N,3,3] intrinsic matrices (camera.cpp:58-66 semantics)."""
        n = self.focal.shape[0]
        z = jnp.zeros_like(self.focal)
        o = jnp.ones_like(self.focal)
        rows = jnp.stack([
            jnp.stack([self.focal, z, self.ppx], axis=-1),
            jnp.stack([z, self.focal * self.aspect, self.ppy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ], axis=-2)
        return rows.reshape(n, 3, 3)

    def K_inv(self) -> jnp.ndarray:
        """[N,3,3] closed-form inverse of K (upper triangular)."""
        f = self.focal
        fy = self.focal * self.aspect
        z = jnp.zeros_like(f)
        o = jnp.ones_like(f)
        rows = jnp.stack([
            jnp.stack([1.0 / f, z, -self.ppx / f], axis=-1),
            jnp.stack([z, 1.0 / fy, -self.ppy / fy], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ], axis=-2)
        return rows.reshape(f.shape[0], 3, 3)

    @classmethod
    def create(cls, focal, ppx, ppy, R=None, aspect=None, t=None) -> "Cameras":
        focal = jnp.asarray(focal, jnp.float32)
        n = focal.shape[0]
        if aspect is None:
            aspect = jnp.ones((n,), jnp.float32)
        if R is None:
            R = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1))
        if t is None:
            t = jnp.zeros((n, 3), jnp.float32)
        return cls(focal=focal, aspect=jnp.asarray(aspect, jnp.float32),
                   ppx=jnp.asarray(ppx, jnp.float32), ppy=jnp.asarray(ppy, jnp.float32),
                   R=jnp.asarray(R, jnp.float32), t=jnp.asarray(t, jnp.float32))

    def select(self, idx) -> "Cameras":
        """Subset/reorder cameras by integer index array."""
        idx = jnp.asarray(idx)
        return Cameras(focal=self.focal[idx], aspect=self.aspect[idx],
                       ppx=self.ppx[idx], ppy=self.ppy[idx],
                       R=self.R[idx], t=self.t[idx])


def single_K(focal: float, ppx: float, ppy: float, aspect: float = 1.0) -> np.ndarray:
    return np.array([[focal, 0, ppx], [0, focal * aspect, ppy], [0, 0, 1]], np.float32)
