"""Worker for the 2-process jax.distributed integration test.

Launched by tests/test_multihost.py as

    python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id>

Each process owns ONE virtual CPU device (XLA_FLAGS set by the parent);
together they form a 2-device global mesh. The worker brings up the
distributed runtime through the library's own launch recipe
(parallel.mesh.initialize_multihost), renders a small scene through the
all_to_all sharded path, and checks the replicated image against the
single-device renderer computed locally. Exit code 0 == pass.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )

    import jax

    jax.config.update("jax_platforms", "cpu")

    from wgpu_3dgs_core_tpu import Camera, render
    from wgpu_3dgs_core_tpu.ops.transforms import cov3d_from_rot_scale
    from wgpu_3dgs_core_tpu.parallel import (
        gaussian_sharding,
        initialize_multihost,
        make_mesh,
        render_sharded,
    )

    pid = initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert pid == proc_id, (pid, proc_id)
    assert jax.process_count() == num_procs
    devs = jax.devices()
    assert len(devs) == num_procs, devs

    # Idempotence contract: a second call is a no-op.
    assert initialize_multihost() == proc_id

    cam = Camera.look_at(eye=(0, 0, -5), target=(0, 0, 0), width=48,
                         height=32, fov_y=0.9)
    rng = np.random.default_rng(0)
    n = 32
    import jax.numpy as jnp

    means = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cov6 = cov3d_from_rot_scale(
        jnp.asarray(q),
        jnp.asarray(0.05 + 0.2 * rng.random((n, 3)), jnp.float32),
    )
    color = jnp.asarray(rng.random((n, 3)), jnp.float32)
    opac = jnp.asarray(0.3 + 0.6 * rng.random(n), jnp.float32)

    mesh = make_mesh()
    shd = gaussian_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, shd, lambda idx: x[idx]
        )

    res = render_sharded(
        put(means), put(cov6), put(color), put(opac), cam, mesh,
        background=(0.1, 0.2, 0.3),
    )
    got = np.asarray(res.image)  # replicated -> addressable everywhere
    want = np.asarray(
        render(means, cov6, color, opac, cam,
               background=(0.1, 0.2, 0.3)).image
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=0)
    assert not bool(np.asarray(res.overflow))
    print(f"proc {proc_id}: multihost render OK", flush=True)


if __name__ == "__main__":
    main()
