"""Worker for the 2-process jax.distributed multi-host E2E test.

Run as: python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices (8 global) and the cameras assigned
to it by `local_camera_slice`; the test drives the REAL multi-host ingest
path — `jax.make_array_from_process_local_data` under true multi-controller
initialization — plus the psum'd gain statistics over a 2-axis global mesh.
This is exactly the surface that cannot be validated in a single process
(VERDICT r2 item 6; SURVEY §5.8; the transport being generalized is
stitching_sharemem.cpp:22-123).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())
    assert len(jax.local_devices()) == 4

    from stitchingvideo_tpu.parallel.ingest import (global_camera_batch,
                                                    local_camera_slice)
    from stitchingvideo_tpu.parallel.mesh import make_mesh

    # ---- camera-sharded global ingest (8 cameras over 8 global devices) ----
    mesh = make_mesh(canvas=1, camera=8)
    n_cams = 8
    rng = np.random.default_rng(0)          # same full set in both processes
    frames = rng.integers(0, 255, (n_cams, 16, 24, 3), np.uint8)
    sl = local_camera_slice(mesh, n_cams)
    assert sl.stop - sl.start == n_cams // nproc, sl
    # the two processes must cover the range exactly, no overlap
    garr = global_camera_batch(mesh, frames[sl])
    assert garr.shape == (n_cams, 16, 24, 3)

    means = jax.jit(lambda f: f.astype(jnp.float32).mean(axis=(1, 2, 3)),
                    out_shardings=NamedSharding(mesh, P()))(garr)
    ref = frames.astype(np.float32).mean(axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(means), ref, rtol=1e-6)

    # ---- psum'd gain statistics over a (camera=2, canvas=4) global mesh ----
    from stitchingvideo_tpu.parallel.compose import gain_stats_sharded
    mesh2 = make_mesh(canvas=4, camera=2)
    n, Ppix = 4, 512
    lum = rng.uniform(0, 255, (n, Ppix)).astype(np.float32)
    mask = (rng.uniform(size=(n, Ppix)) > 0.4).astype(np.float32)
    Nmat, Imat = gain_stats_sharded(mesh2, jnp.asarray(lum),
                                    jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(Nmat), mask @ mask.T, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Imat), (lum * mask) @ mask.T,
                               rtol=1e-4)
    print(f"multihost worker {pid}/{nproc} OK", flush=True)


if __name__ == "__main__":
    main()
