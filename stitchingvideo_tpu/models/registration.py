"""Registration state: everything the per-frame compose path needs, as one
serializable pytree.

This is the TPU redesign of the reference RT driver's cached globals —
cameras, per-camera warp LUTs (xmapstitch/ymapstitch), seam masks, gain maps,
composite LUT and double-buffer flags (reference 64-bit driver
stitching_detailed.cpp:30-47, :117-177, :658-684, :696-722) — plus the
persistence the reference never wired up (SURVEY §5.4: camera-mp4.yml intent).
Serialize with orbax or jnp.savez via `state_dict`.
"""
from __future__ import annotations

from typing import Tuple

import flax.struct
import jax.numpy as jnp
import numpy as np

from .camera import Cameras


@flax.struct.dataclass
class Registration:
    """Cached registration output at compose scale.

    Static metadata lives in aux_data (flax.struct pytree_node=False) so a
    re-registration with identical shapes never triggers recompilation.

    cameras:     Cameras (compose scale intrinsics)
    corners:     [N, 2] int32 canvas-space (x, y) of each warp ROI top-left
    valid:       [N, Hr, Wr] bool  warp footprint (padded ROI)
    xmaps/ymaps: [N, Hr, Wr] float32 backward maps: ROI pixel -> source pixel
    seam_masks:  [N, Hr, Wr] bool  seam ownership on the ROI grid
    gain_maps:   [N, Hr, Wr] float32 per-pixel exposure gain on the ROI grid
    canvas_wh:   (W, H) static panorama canvas size (bucketed to 64 px so
                 re-registrations reuse compiled programs)
    extent_wh:   (W, H) true covered extent before bucketing — everything
                 right of/below it is uncovered pad (cam_idx=-1, black) and
                 must be cropped from any displayed/encoded output
    roi_hw:      (Hr, Wr) static padded per-camera ROI shape
    warp_kind / warp_scale: projection metadata (static)
    """
    cameras: Cameras
    corners: jnp.ndarray
    valid: jnp.ndarray
    xmaps: jnp.ndarray
    ymaps: jnp.ndarray
    seam_masks: jnp.ndarray
    gain_maps: jnp.ndarray
    canvas_wh: Tuple[int, int] = flax.struct.field(pytree_node=False)
    roi_hw: Tuple[int, int] = flax.struct.field(pytree_node=False)
    warp_kind: str = flax.struct.field(pytree_node=False)
    warp_scale: float = flax.struct.field(pytree_node=False)
    # true covered extent (W, H); canvas_wh minus the 64-px bucket pad.
    # None (legacy checkpoints) means "unknown — treat canvas_wh as covered".
    extent_wh: Tuple[int, int] = flax.struct.field(pytree_node=False,
                                                   default=None)
    # indices into the ORIGINAL rig frame list of the cameras this
    # registration kept (the match graph's biggest component,
    # matchers.cpp leaveBiggestComponent parity). None (legacy
    # checkpoints) means identity — all rig cameras kept, in order. The
    # video hot loop selects frames through this before compositing.
    src_indices: Tuple[int, ...] = flax.struct.field(pytree_node=False,
                                                     default=None)

    @property
    def n_cameras(self) -> int:
        return self.xmaps.shape[0]

    def state_dict(self) -> dict:
        """numpy snapshot for persistence (closing SURVEY §5.4's gap)."""
        return {
            "focal": np.asarray(self.cameras.focal),
            "aspect": np.asarray(self.cameras.aspect),
            "ppx": np.asarray(self.cameras.ppx),
            "ppy": np.asarray(self.cameras.ppy),
            "R": np.asarray(self.cameras.R),
            "t": np.asarray(self.cameras.t),
            "corners": np.asarray(self.corners),
            "valid": np.asarray(self.valid),
            "xmaps": np.asarray(self.xmaps),
            "ymaps": np.asarray(self.ymaps),
            "seam_masks": np.asarray(self.seam_masks),
            "gain_maps": np.asarray(self.gain_maps),
            "canvas_wh": np.asarray(self.canvas_wh),
            "extent_wh": np.asarray(self.extent_wh
                                    if self.extent_wh is not None
                                    else self.canvas_wh),
            "roi_hw": np.asarray(self.roi_hw),
            "warp_kind": np.asarray(self.warp_kind),
            "warp_scale": np.asarray(self.warp_scale),
            "src_indices": np.asarray(self.src_indices
                                      if self.src_indices is not None
                                      else np.arange(self.xmaps.shape[0])),
        }

    @classmethod
    def from_state_dict(cls, d: dict) -> "Registration":
        cams = Cameras(focal=jnp.asarray(d["focal"]), aspect=jnp.asarray(d["aspect"]),
                       ppx=jnp.asarray(d["ppx"]), ppy=jnp.asarray(d["ppy"]),
                       R=jnp.asarray(d["R"]), t=jnp.asarray(d["t"]))
        return cls(cameras=cams, corners=jnp.asarray(d["corners"]),
                   valid=jnp.asarray(d["valid"]),
                   xmaps=jnp.asarray(d["xmaps"]), ymaps=jnp.asarray(d["ymaps"]),
                   seam_masks=jnp.asarray(d["seam_masks"]),
                   gain_maps=jnp.asarray(d["gain_maps"]),
                   canvas_wh=tuple(int(x) for x in np.asarray(d["canvas_wh"])),
                   extent_wh=(tuple(int(x) for x in np.asarray(d["extent_wh"]))
                              if "extent_wh" in d else None),
                   roi_hw=tuple(int(x) for x in np.asarray(d["roi_hw"])),
                   warp_kind=str(np.asarray(d["warp_kind"])),
                   warp_scale=float(np.asarray(d["warp_scale"])),
                   src_indices=(tuple(int(i) for i in
                                      np.asarray(d["src_indices"]))
                                if "src_indices" in d else None))

    def save(self, path: str) -> None:
        np.savez_compressed(path, **self.state_dict())

    @classmethod
    def load(cls, path: str) -> "Registration":
        with np.load(path, allow_pickle=False) as z:
            return cls.from_state_dict({k: z[k] for k in z.files})
