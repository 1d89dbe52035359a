"""Model-layer tests: MLP vs the NumPy golden forward, appearance add, time
variant, init statistics (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

import golden_ref as gold
from danerf_tpu.config import NeRFConfig
from danerf_tpu.models import (
    init_appearance_embeddings,
    init_nerf_params,
    nerf_apply,
    nerf_param_count,
)

CFG = NeRFConfig(use_bf16=False)
SMALL = NeRFConfig(hidden_dim=32, num_layers=4, skip_connect_layers=(2,),
                   use_bf16=False, appearance_dim=8)


def _np_params(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), params)


def test_forward_matches_golden_numpy():
    params = init_nerf_params(jax.random.key(0), SMALL)
    x = np.random.default_rng(1).standard_normal((50, 3)).astype(np.float32)
    d = np.random.default_rng(2).standard_normal((50, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    emb = np.random.default_rng(3).standard_normal((50, 8)).astype(np.float32)

    rgb, sigma = nerf_apply(params, SMALL, jnp.asarray(x), jnp.asarray(d), jnp.asarray(emb))
    rgb_g, sigma_g = gold.nerf_mlp(_np_params(params), SMALL, x, d, emb)
    np.testing.assert_allclose(np.asarray(rgb), rgb_g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sigma), sigma_g, atol=1e-4)


def test_forward_shapes_and_ranges():
    # mirrors the reference's startup smoke test (run.py:327-344)
    params = init_nerf_params(jax.random.key(0), CFG)
    x = jax.random.normal(jax.random.key(1), (10, 3))
    d = jax.random.normal(jax.random.key(2), (10, 3))
    rgb, sigma = nerf_apply(params, CFG, x, d)
    assert rgb.shape == (10, 3) and sigma.shape == (10,)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1
    assert float(sigma.min()) >= 0

    emb = jax.random.normal(jax.random.key(3), (10, CFG.appearance_dim))
    rgb2, _ = nerf_apply(params, CFG, x, d, emb)
    assert rgb2.shape == (10, 3)
    assert not np.allclose(np.asarray(rgb), np.asarray(rgb2))


def test_appearance_embedding_shifts_color_not_density():
    params = init_nerf_params(jax.random.key(0), SMALL)
    x = jax.random.normal(jax.random.key(1), (20, 3))
    d = jax.random.normal(jax.random.key(2), (20, 3))
    e1 = jnp.zeros((20, 8))
    e2 = jnp.ones((20, 8))
    rgb1, s1 = nerf_apply(params, SMALL, x, d, e1)
    rgb2, s2 = nerf_apply(params, SMALL, x, d, e2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    assert not np.allclose(np.asarray(rgb1), np.asarray(rgb2))


def test_param_shapes_match_reference_architecture():
    # reference dims: trunk0 63->256, skip layer 4 319->256, density 256->1,
    # dir 283->128, appearance 32->128, rgb 128->3 (src/models.py:83-103)
    params = init_nerf_params(jax.random.key(0), CFG)
    trunk = params["trunk"]
    assert trunk[0]["w"].shape == (63, 256)
    for i in range(1, 8):
        want_in = 256 + 63 if i == 4 else 256
        assert trunk[i]["w"].shape == (want_in, 256), i
    assert params["density"]["w"].shape == (256, 1)
    assert params["dir"]["w"].shape == (256 + 27, 128)
    assert params["appearance_proj"]["w"].shape == (32, 128)
    assert params["rgb"]["w"].shape == (128, 3)


def test_init_matches_torch_linear_distribution():
    # torch default: U(-1/sqrt(in), 1/sqrt(in)); check bound + rough variance
    params = init_nerf_params(jax.random.key(0), CFG)
    w = np.asarray(params["trunk"][1]["w"])  # (256, 256)
    bound = 1 / np.sqrt(256)
    assert np.abs(w).max() <= bound + 1e-7
    np.testing.assert_allclose(w.std(), bound / np.sqrt(3), rtol=0.05)


def test_time_conditioned_variant():
    cfg = SMALL.replace(use_time=True, time_enc_levels=4)
    params = init_nerf_params(jax.random.key(0), cfg)
    # input dim grows by time encoding (reference AnimatedNeRF src/models.py:187)
    assert params["trunk"][0]["w"].shape[0] == cfg.pos_enc_dim + cfg.time_enc_dim
    x = jax.random.normal(jax.random.key(1), (10, 3))
    d = jax.random.normal(jax.random.key(2), (10, 3))
    t = jnp.full((10, 1), 0.5)
    rgb, sigma = nerf_apply(params, cfg, x, d, t=t)
    assert rgb.shape == (10, 3) and sigma.shape == (10,)
    rgb2, _ = nerf_apply(params, cfg, x, d, t=jnp.zeros((10, 1)))
    assert not np.allclose(np.asarray(rgb), np.asarray(rgb2))


def test_bf16_path_close_to_fp32():
    cfg32 = CFG
    cfg16 = CFG.replace(use_bf16=True)
    params = init_nerf_params(jax.random.key(0), cfg32)
    x = jax.random.normal(jax.random.key(1), (64, 3))
    d = jax.random.normal(jax.random.key(2), (64, 3))
    rgb32, s32 = nerf_apply(params, cfg32, x, d)
    rgb16, s16 = nerf_apply(params, cfg16, x, d)
    assert rgb16.dtype == jnp.float32  # fp32 accumulation out of the MXU
    np.testing.assert_allclose(np.asarray(rgb16), np.asarray(rgb32), atol=0.05)
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), atol=0.3)


def test_param_count_and_embeddings():
    emb = init_appearance_embeddings(jax.random.key(0), 100, 32)
    assert emb.shape == (100, 32)
    assert abs(float(emb.mean())) < 0.1 and abs(float(emb.std()) - 1.0) < 0.1
    params = init_nerf_params(jax.random.key(0), CFG)
    assert nerf_param_count(params) > 500_000  # 8x256 trunk ~ 545k
