"""Cross-validation of the core math against direct torch implementations of
the reference formulas (torch CPU ships in the image).

These complement the NumPy goldens: torch's searchsorted/cumprod/linspace
semantics are exactly what the reference runs on, so agreement here closes the
loop on SURVEY.md §4's numerical-equivalence bar without importing any
reference code.  Each test states the formula it implements with its citation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from danerf_tpu.ops import (composite, positional_encoding, sample_pdf,
                            sample_stratified)


def test_encoding_vs_torch():
    # gamma(x) = [x, sin(2^i x), cos(2^i x)] (src/models.py:36-44)
    # fp32 on both sides: sin(2^9 x) amplifies any input-precision delta by
    # the frequency, so the comparison must share the exact input dtype.
    x = torch.randn(33, 3, dtype=torch.float32)
    outs = [x]
    for i in range(10):
        f = 2.0 ** i
        outs += [torch.sin(f * x), torch.cos(f * x)]
    want = torch.cat(outs, dim=-1).numpy()
    got = positional_encoding(jnp.asarray(x.numpy()), 10)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_stratified_vs_torch_unperturbed():
    # z = near + linspace(0,1,n) * (far-near) (src/ray_utils.py:69-70)
    t = torch.linspace(0.0, 1.0, 64, dtype=torch.float64)
    want = (2.0 + t * 4.0).numpy()
    o = jnp.zeros((5, 3))
    d = jnp.ones((5, 3))
    z, _ = sample_stratified(jax.random.key(0), o, d, 2.0, 6.0, 64, perturb=False)
    np.testing.assert_allclose(np.asarray(z[0]), want, atol=1e-5)


def test_sample_pdf_vs_torch_searchsorted():
    """The bracketing indices must match torch.searchsorted(right=False)
    (src/ray_utils.py:122), including ties at CDF boundaries."""
    rng = np.random.default_rng(0)
    w = rng.random((7, 16))
    w[0, :] = 0.0
    w[0, 8] = 1.0  # delta distribution exercises the tie/clamp paths
    z = np.broadcast_to(np.linspace(2.0, 6.0, 16), (7, 16)).copy()

    # torch pipeline (formulas from src/ray_utils.py:105-139, z-gather clamped
    # into range like the build — the reference's raw gather would go OOB)
    wt = torch.tensor(w) + 1e-5
    wt = wt / wt.sum(-1, keepdim=True)
    cdf = torch.cumsum(wt, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    n_imp = 24
    u = torch.linspace(0.0, 1.0, n_imp + 1, dtype=torch.float64)[:-1]
    u = (u + 0.5 / n_imp).expand(7, n_imp).contiguous()
    inds = torch.searchsorted(cdf, u)
    below = torch.clamp_min(inds - 1, 0)
    above = torch.clamp_max(inds, cdf.shape[-1] - 1)
    zt = torch.tensor(z)
    zmax = zt.shape[-1] - 1
    z_b = torch.gather(zt, -1, torch.clamp_max(below, zmax))
    z_a = torch.gather(zt, -1, torch.clamp_max(above, zmax))
    cdf_b = torch.gather(cdf, -1, below)
    cdf_a = torch.gather(cdf, -1, above)
    denom = cdf_a - cdf_b
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    tt = (u - cdf_b) / denom
    want = (z_b + tt * (z_a - z_b)).numpy()

    got = sample_pdf(jax.random.key(0), jnp.asarray(z, jnp.float32),
                     jnp.asarray(w, jnp.float32), n_imp, perturb=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_composite_vs_torch():
    """alpha/exclusive-cumprod/weights/depth (src/render.py:56-80)."""
    rng = np.random.default_rng(1)
    R, S = 9, 32
    rgb = rng.random((R, S, 3))
    sigma = rng.random((R, S)) * 4
    z = np.sort(rng.random((R, S)) * 4 + 2, -1)

    zt = torch.tensor(z)
    st = torch.tensor(sigma).unsqueeze(-1)
    ct = torch.tensor(rgb)
    dists = zt[..., 1:] - zt[..., :-1]
    dists = torch.cat([dists, torch.ones_like(dists[..., :1]) * 1e-3], -1).unsqueeze(-1)
    alpha = 1.0 - torch.exp(-st * dists)
    trans = torch.cumprod(
        torch.cat([torch.ones_like(alpha[:, :1, :]), 1.0 - alpha + 1e-10], 1), 1
    )[:, :-1, :]
    weights = alpha * trans
    rgb_want = torch.sum(weights * ct, 1).numpy()
    depth_want = (torch.sum(weights * zt.unsqueeze(-1), 1)
                  / (torch.sum(weights, 1) + 1e-10)).squeeze(-1).numpy()

    out = composite(jnp.asarray(rgb, jnp.float32), jnp.asarray(sigma, jnp.float32),
                    jnp.asarray(z, jnp.float32))
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_want, atol=1e-3)


def test_linear_init_statistics_vs_torch():
    """Init distribution must match torch.nn.Linear defaults
    (uniform +-1/sqrt(fan_in) for weight and bias)."""
    from danerf_tpu.config import NeRFConfig
    from danerf_tpu.models import init_nerf_params

    lin = torch.nn.Linear(256, 256)
    tw = lin.weight.detach().numpy()
    params = init_nerf_params(jax.random.key(0), NeRFConfig())
    jw = np.asarray(params["trunk"][1]["w"])
    np.testing.assert_allclose(np.abs(jw).max(), np.abs(tw).max(), rtol=0.02)
    np.testing.assert_allclose(jw.std(), tw.std(), rtol=0.05)


@pytest.mark.slow
def test_mirror_trajectory_tracks_torch_reference():
    """The JAX mirror of the reference trainer (benchmarks/jax_reference.py)
    must be trajectory-PAIRED with the torch trainer: same torch-exported
    init + same numpy RNG stream (torch_reference.make_step_inputs protocol)
    => per-step losses equal up to f32 summation order.  This is the
    equivalence that lets the multi-seed parity statistics run through the
    mirror on TPU (the torch side costs ~8 h/seed on this host).

    Covers the HIERARCHICAL path too (importance resample + union sort +
    fine MSE + coarse auxiliary), i.e. the torch anchor of VERDICT item 8.
    """
    from benchmarks.jax_reference import train_mirror
    from benchmarks.torch_reference import train_reference
    from danerf_tpu.config import NeRFConfig

    cfg = NeRFConfig(hidden_dim=48, num_layers=3, skip_connect_layers=(2,),
                     num_samples=12, num_importance=6, batch_size=96,
                     use_bf16=False, use_pallas=False, appearance_dim=8,
                     pos_enc_levels=4, dir_enc_levels=2, warmup_iters=2)
    rng = np.random.default_rng(1)
    images = rng.random((3, 16, 16, 3), dtype=np.float32)
    c2ws = np.stack([np.eye(4, dtype=np.float32)] * 3)
    c2ws[:, 2, 3] = 4.0

    init = {}
    _, _, mses_t = train_reference(cfg, images, c2ws, 20.0, 16, seed=3,
                                   init_out=init, log_every=10 ** 9)
    _, mses_j = train_mirror(cfg, images, c2ws, 20.0, 16, seed=3,
                             init=init, chunk=5)
    mt, mj = np.asarray(mses_t), np.asarray(mses_j)
    rel = np.abs(mt - mj) / np.maximum(np.abs(mt), 1e-12)
    assert rel.max() < 2e-3, f"trajectory drift {rel.max():.2e}\n{mt}\n{mj}"
