"""Worker for the REAL multi-process runtime test (tests/test_multiprocess.py).

Launched as N separate OS processes: each initializes jax.distributed against
a local coordinator, joins a global CPU mesh (2 local devices per process via
xla_force_host_platform_device_count), runs the production sharded train step
for a few optimizer steps, and writes its per-step losses + final param
checksum to a JSON file.  The parent test asserts the trajectory equals the
single-process run of the identical program — converting the SPMD contract of
danerf_tpu/parallel/mesh.py (module docstring) from prose into running code.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import os
import sys

LOCAL_DEVICES = 2


def main():
    pid, nprocs, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}").strip()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    # The env image pins JAX_PLATFORMS=axon from sitecustomize (which imports
    # jax before this script body runs), so the env var is too late — the
    # config knob still wins at first-backend-use time (same as conftest).
    jax.config.update("jax_platforms", "cpu")
    # Multi-process CPU needs a cross-process collectives backend; gloo is
    # what jax ships for CPU clusters (TPU pods use ICI and skip this).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from danerf_tpu.parallel import initialize_distributed

    assert initialize_distributed(f"localhost:{port}", nprocs, pid) is True

    import jax

    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == nprocs * LOCAL_DEVICES

    losses, state = run_steps(jax.device_count())

    if pid == 0:
        import numpy as np

        checksum = float(sum(np.abs(np.asarray(x)).sum()
                             for x in jax.tree_util.tree_leaves(state.params)))
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "param_checksum": checksum,
                       "process_count": jax.process_count(),
                       "device_count": jax.device_count()}, f)


def run_steps(n_devices, n_calls=3):
    """The program under test — identical for the multi-process workers and
    the single-process baseline (imported by tests/test_multiprocess.py)."""
    import jax

    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.data import make_synthetic_scene
    from danerf_tpu.parallel import (make_mesh, make_sharded_train_step,
                                     replicate_pool, shard_train_state)
    from danerf_tpu.train import create_train_state

    cfg = NeRFConfig(hidden_dim=32, num_layers=2, skip_connect_layers=(),
                     num_samples=8, num_importance=0, batch_size=16,
                     use_bf16=False, use_pallas=False, appearance_dim=4,
                     pos_enc_levels=4, dir_enc_levels=2,
                     mesh_data=n_devices, mesh_model=1)
    scene = make_synthetic_scene("train", n_images=2, height=8, width=8)
    mesh = make_mesh(data=n_devices, model=1,
                     devices=jax.devices()[:n_devices])
    state = create_train_state(jax.random.key(0), cfg, scene.n_images)
    state = shard_train_state(state, mesh)
    pool = replicate_pool(scene.device_arrays(), mesh)
    step = make_sharded_train_step(cfg, mesh, scene.height, scene.width,
                                   scene.focal, steps_per_call=2)
    losses = []
    for _ in range(n_calls):
        state, metrics = step(state, pool)
        losses.append(float(metrics["loss"]))
    return losses, state


if __name__ == "__main__":
    main()
