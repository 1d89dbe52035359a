"""Device mesh + shardings: the distributed runtime the reference never had.

The reference is strictly single-device (no torch.distributed, no NCCL/MPI —
grep-verified in SURVEY.md §2/§5.8); its only scaling lever is ray chunking.
The TPU-native design follows the BASELINE.json north star: a ``Mesh`` over the
pod slice with axes ``(data, model)``:

- ``data``:  rays/pixels sharded.  Each device renders its slice of the batch;
  parameter gradients are all-reduced over ICI.  The psum is not hand-written —
  params are placed replicated, the batch is constrained to
  ``P('data')``, and GSPMD inserts (and overlaps) the reduction.
- ``model``: optional Megatron-style tensor parallelism over the MLP hidden
  dim: alternating column-/row-parallel trunk layers so each layer pair needs
  one reduction.  For an 8x256 MLP this is about capability + dryrun coverage,
  not speed — pure DP is the recommended production mesh.

Multi-host entry is ``initialize_distributed`` -> ``jax.distributed.initialize``
(CLI: ``danerf train --coordinator_address ... --num_processes N
--process_id i``), after which ``jax.devices()`` is the GLOBAL device list and
``make_mesh`` spans the slice.  Data disjointness across hosts follows the
SPMD contract, not key-folding: every process runs the identical jitted
program, so the batch key (part of the replicated train state) MUST be equal
everywhere — the globally-identical sampled batch is then constrained to
``P('data')`` and GSPMD gives each device (hence each host) a disjoint slice
of it.  Folding ``jax.process_index()`` into an in-jit sampling key would
break that contract (processes would disagree about the contents of one
global array).  Host-side work that is NOT under a global jit (whole-frame
rendering of a camera path) is partitioned per process explicitly — see
``process_slice``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from danerf_tpu.config import NeRFConfig


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init (no-op when single-process).

    Call BEFORE any other jax API touches the backend.  On TPU pods the three
    arguments can all be None (resolved from the TPU environment); explicit
    values support GPU/CPU clusters and tests.  Returns True when a
    multi-process runtime was initialized.
    """
    if num_processes is not None and num_processes == 1:
        return False
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        return False
    jax.distributed.initialize(coordinator_address, num_processes, process_id)
    return True


def process_slice(n_items: int) -> slice:
    """This process's contiguous share of ``n_items`` host-side work items.

    For work OUTSIDE a global jit (e.g. rendering the frames of a camera
    path), each host takes a disjoint slice; inside a jit, disjointness is
    GSPMD's job (see module docstring).
    """
    p, n = jax.process_index(), jax.process_count()
    per = -(-n_items // n)
    return slice(p * per, min((p + 1) * per, n_items))


def make_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh over ``devices`` (default: all)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data is None:
        data = devices.size // model
    assert data * model == devices.size, (
        f"mesh {data}x{model} != {devices.size} devices")
    return Mesh(devices.reshape(data, model), ("data", "model"))


# ----------------------------------------------------------------- shardings

def param_pspecs(params: Any, tensor_parallel: bool) -> Any:
    """PartitionSpecs for the param pytree.

    Pure DP: everything replicated (spec ``P()``).  With tensor parallelism the
    trunk alternates column-parallel (w: P(None,'model'), b: P('model')) and
    row-parallel (w: P('model', None), b: P()) layers; heads stay replicated
    (they are (256, <=128) — too small to matter).
    """
    def rep(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    if not tensor_parallel:
        return rep(params)

    specs = {k: rep(v) for k, v in params.items() if k != "model"}
    model = params["model"]
    mspec = {k: rep(v) for k, v in model.items() if k != "trunk"}
    trunk_specs = []
    for i in range(len(model["trunk"])):
        if i % 2 == 0:  # column parallel: split output features
            trunk_specs.append({"w": P(None, "model"), "b": P("model")})
        else:           # row parallel: split input features
            trunk_specs.append({"w": P("model", None), "b": P()})
    mspec["trunk"] = trunk_specs
    specs["model"] = mspec
    return specs


def _sharding_tree(pspecs, mesh):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pspecs,
        is_leaf=lambda x: isinstance(x, P))


def _global_put(x, sharding: NamedSharding):
    """device_put that also works when the mesh spans MULTIPLE PROCESSES.

    jax.device_put requires fully-addressable shardings; on a multi-process
    mesh each process holds only its local shards, so the global array is
    assembled with make_array_from_callback from the host value — which the
    SPMD contract (module docstring) guarantees is identical in every
    process.
    """
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        # typed PRNG keys can't round-trip through numpy; move the raw key
        # data and re-wrap (bitcast) under the same impl
        impl = jax.random.key_impl(x)
        data = _global_put(jax.random.key_data(x), sharding)
        return jax.jit(partial(jax.random.wrap_key_data, impl=impl))(data)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_train_state(state, mesh: Mesh, tensor_parallel: bool = False):
    """Place a TrainState on the mesh (params per param_pspecs, rest replicated)."""
    shardings = _sharding_tree(param_pspecs(state.params, tensor_parallel), mesh)
    params = jax.tree_util.tree_map(_global_put, state.params, shardings)
    # Adam moments mirror the param shardings via sharding propagation; initial
    # placement replicated is fine (they're re-laid-out on first update).
    rep = NamedSharding(mesh, P())
    opt_state = jax.tree_util.tree_map(lambda x: _global_put(x, rep), state.opt_state)
    return type(state)(params, opt_state,
                       _global_put(state.step, rep), _global_put(state.key, rep))


def replicate_pool(pool, mesh: Mesh):
    """Replicate the ray pool across the mesh.

    Rays are sampled on device per step, so every device needs the whole image
    pool; at ~256 MB for a full 100-image scene this fits HBM comfortably and
    avoids any cross-device gather in the hot loop.
    """
    rep = NamedSharding(mesh, P())
    return {k: _global_put(v, rep) for k, v in pool.items()}


# ------------------------------------------------------------ sharded steps

def make_sharded_train_step(cfg: NeRFConfig, mesh: Mesh, height: int, width: int,
                            focal: float, batch_size: Optional[int] = None,
                            tensor_parallel: bool = False,
                            steps_per_call: int = 1):
    # tensor_parallel needs no special handling here: the param layout set by
    # shard_train_state propagates through GSPMD; the flag documents intent.
    """Jitted train step with the global batch sharded over the 'data' axis.

    The batch tensors are constrained to ``P('data')`` right after sampling, so
    GSPMD shards the entire render + backward over rays and inserts the
    gradient all-reduce against the replicated params (riding ICI).
    steps_per_call > 1 runs a lax.scan of optimizer steps per dispatch, same
    semantics as the single-device trainer.
    """
    import optax

    from danerf_tpu.data.dataset import sample_ray_batch
    from danerf_tpu.train.metrics import psnr
    from danerf_tpu.train.trainer import (TrainState, compute_loss_and_grads,
                                           make_optimizer)

    opt = make_optimizer(cfg)
    batch_sharding = NamedSharding(mesh, P("data"))

    def constrain(batch):
        return {k: jax.lax.with_sharding_constraint(v, batch_sharding)
                for k, v in batch.items()}

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, pool):
        def one_step(state: TrainState):
            k_batch, k_render, k_next = jax.random.split(state.key, 3)
            batch = sample_ray_batch(k_batch, pool, cfg, height, width, focal,
                                     batch_size=batch_size)
            batch = constrain(batch)
            (loss, aux), grads = compute_loss_and_grads(
                state.params, cfg, k_render, batch)
            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = {"loss": loss, "psnr": psnr(aux["mse"]), **aux}
            return TrainState(params, opt_state, state.step + 1, k_next), metrics

        # fori_loop, not scan — see make_train_step for the compile rationale.
        state, metrics = one_step(state)
        if steps_per_call > 1:
            state, metrics = jax.lax.fori_loop(
                0, steps_per_call - 1,
                lambda i, carry: one_step(carry[0]),
                (state, metrics))
        return state, metrics

    return train_step


def make_sharded_render(cfg: NeRFConfig, mesh: Mesh, height: int, width: int,
                        n_samples: int, n_importance: int):
    """Whole-frame render with rays sharded over every device on the mesh.

    The reference renders 800x800 frames through a serial Python chunk loop
    with per-chunk host syncs (run.py:212-228); here the frame's rays are laid
    out ``P('data')`` and each device composites its tile in one program.
    """
    from danerf_tpu.render.renderer import render_rays

    ray_sharding = NamedSharding(mesh, P("data"))

    @partial(jax.jit, static_argnames=("perturb",))
    def render(params, key, rays_o, rays_d, emb, perturb=False):
        rays_o = jax.lax.with_sharding_constraint(rays_o, ray_sharding)
        rays_d = jax.lax.with_sharding_constraint(rays_d, ray_sharding)
        out = render_rays(params, cfg, key, rays_o, rays_d, emb,
                          n_samples=n_samples, n_importance=n_importance,
                          perturb=perturb)
        return out["rgb"], out["depth"], out["acc"]

    return render
