"""Unit + golden tests for the L0 math core (SURVEY.md §4 unit-test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import golden_ref as gold
from danerf_tpu.ops import (
    composite,
    combine_z,
    encoding_output_dim,
    generate_rays,
    look_at_c2w,
    positional_encoding,
    rays_for_pixels,
    sample_pdf,
    sample_stratified,
)

RNG = np.random.default_rng(0)


# ---------------------------------------------------------------- encoding

@pytest.mark.parametrize("L,include", [(10, True), (4, True), (6, False), (0, True)])
def test_encoding_matches_golden(L, include):
    x = RNG.standard_normal((17, 3)).astype(np.float32)
    got = positional_encoding(jnp.asarray(x), L, include)
    want = gold.positional_encoding(x.astype(np.float64), L, include)
    assert got.shape[-1] == encoding_output_dim(3, L, include)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_encoding_dim_formula():
    # reference src/models.py:73-74: pos 3*(1+2*10)=63, dir 3*(1+2*4)=27
    assert encoding_output_dim(3, 10) == 63
    assert encoding_output_dim(3, 4) == 27
    assert encoding_output_dim(1, 6) == 13


def test_encoding_gradient_finite():
    f = lambda x: positional_encoding(x, 10).sum()
    g = jax.grad(f)(jnp.ones((3,)))
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- rays

def _random_c2w(rng):
    # random rotation via QR + random translation
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = q
    c2w[:3, 3] = rng.standard_normal(3)
    return c2w.astype(np.float32)


def test_rays_match_golden_grid():
    c2w = _random_c2w(RNG)
    o, d = generate_rays(8, 12, 20.0, jnp.asarray(c2w))
    og, dg = gold.get_rays(8, 12, 20.0, c2w)
    np.testing.assert_allclose(np.asarray(o), og, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), dg, atol=1e-5)


def test_rays_identity_camera_axes():
    # Identity c2w: center pixel looks down -z; +j moves +x; +i moves -y
    # (reference convention src/ray_utils.py:26-28).
    H = W = 9
    _, d = generate_rays(H, W, 50.0, jnp.eye(4))
    d = np.asarray(d)
    assert d[4, 4] @ np.array([0, 0, -1]) > 0.999
    assert d[4, 8][0] > d[4, 0][0]   # +x to the right
    assert d[8, 4][1] < d[0, 4][1]   # +i (down) decreases y


def test_rays_for_pixels_matches_grid():
    c2w = _random_c2w(RNG)
    H, W, f = 7, 11, 15.0
    o_grid, d_grid = generate_rays(H, W, f, jnp.asarray(c2w))
    idx = jnp.asarray(RNG.integers(0, H * W, size=32), jnp.int32)
    o, d = rays_for_pixels(idx, jnp.asarray(c2w), H, W, f)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_grid).reshape(-1, 3)[idx], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_grid).reshape(-1, 3)[idx], atol=1e-6)


def test_rays_for_pixels_per_ray_cameras():
    c2ws = np.stack([_random_c2w(RNG) for _ in range(4)])
    idx = jnp.asarray([0, 5, 10, 20], jnp.int32)
    o, d = rays_for_pixels(idx, jnp.asarray(c2ws), 6, 6, 10.0)
    for k in range(4):
        ok, dk = rays_for_pixels(idx[k:k+1], jnp.asarray(c2ws[k]), 6, 6, 10.0)
        np.testing.assert_allclose(np.asarray(o[k]), np.asarray(ok[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d[k]), np.asarray(dk[0]), atol=1e-6)


def test_look_at_c2w_orthonormal_and_points_at_center():
    c2w = look_at_c2w([4, 1, 3], [0, 0.5, 0], [0, 1, 0])
    R = c2w[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    # camera -z axis (third column negated) points from pos toward center
    fwd = -R[:, 2]
    want = np.array([0, 0.5, 0]) - np.array([4, 1, 3])
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(fwd, want, atol=1e-6)


# ---------------------------------------------------------------- stratified

def test_stratified_unperturbed_matches_golden():
    o = RNG.standard_normal((5, 3)).astype(np.float32)
    d = RNG.standard_normal((5, 3)).astype(np.float32)
    z, pts = sample_stratified(jax.random.key(0), jnp.asarray(o), jnp.asarray(d),
                               2.0, 6.0, 64, perturb=False)
    zg, pg = gold.sample_stratified(o.astype(np.float64), d.astype(np.float64), 2.0, 6.0, 64)
    np.testing.assert_allclose(np.asarray(z), zg, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts), pg, atol=1e-4)


def test_stratified_perturbed_stays_in_bins():
    o = jnp.zeros((100, 3))
    d = jnp.ones((100, 3))
    z, _ = sample_stratified(jax.random.key(1), o, d, 2.0, 6.0, 16, perturb=True)
    z = np.asarray(z)
    z0 = np.linspace(2.0, 6.0, 16)
    mids = 0.5 * (z0[1:] + z0[:-1])
    lower = np.concatenate([[z0[0]], mids])
    upper = np.concatenate([mids, [z0[-1]]])
    assert np.all(z >= lower - 1e-6) and np.all(z <= upper + 1e-6)
    assert np.all(np.diff(z, axis=-1) > -1e-6)  # still sorted
    # deterministic given the key
    z2, _ = sample_stratified(jax.random.key(1), o, d, 2.0, 6.0, 16, perturb=True)
    np.testing.assert_array_equal(z, np.asarray(z2))


# ---------------------------------------------------------------- importance

def test_sample_pdf_matches_golden_hand_cdf():
    # Hand-built weights concentrating mass in one bin.
    z = np.linspace(2.0, 6.0, 8)[None].repeat(3, 0)
    w = np.array([
        [0, 0, 0, 1, 0, 0, 0, 0],
        [1, 1, 1, 1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 1],
    ], dtype=np.float64)
    got = sample_pdf(jax.random.key(0), jnp.asarray(z, jnp.float32),
                     jnp.asarray(w, jnp.float32), 16, perturb=False)
    want = gold.sample_pdf(z, w, 16)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_sample_pdf_concentrates_where_weights_are():
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 64), (10, 64))
    w = jnp.zeros((10, 64)).at[:, 30:34].set(1.0)
    zf = np.asarray(sample_pdf(jax.random.key(3), z, w, 64, perturb=True))
    z_np = np.linspace(2.0, 6.0, 64)
    lo, hi = z_np[28], z_np[36]
    frac_inside = np.mean((zf > lo) & (zf < hi))
    assert frac_inside > 0.9


def test_sample_pdf_uniform_weights_spread():
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 32), (4, 32))
    w = jnp.ones((4, 32))
    zf = np.asarray(sample_pdf(jax.random.key(4), z, w, 128, perturb=True))
    assert zf.min() >= 2.0 - 1e-4 and zf.max() <= 6.0 + 1e-4
    hist, _ = np.histogram(zf, bins=8, range=(2.0, 6.0))
    assert hist.min() > 0.5 * hist.mean()


def test_combine_z_sorted_and_positions():
    o = jnp.zeros((2, 3))
    d = jnp.asarray([[0, 0, 1.0], [0, 1.0, 0]])
    zc = jnp.asarray([[2.0, 3.0, 4.0], [2.0, 3.0, 4.0]])
    zf = jnp.asarray([[3.5, 2.5], [5.0, 2.1]])
    z_all, pts = combine_z(o, d, zc, zf)
    assert np.all(np.diff(np.asarray(z_all), axis=-1) >= 0)
    np.testing.assert_allclose(np.asarray(pts[0, :, 2]), np.asarray(z_all[0]), atol=1e-6)


# ---------------------------------------------------------------- composite

def test_composite_matches_golden():
    R, S = 13, 64
    rgb = RNG.random((R, S, 3))
    sigma = RNG.random((R, S)) * 5
    z = np.sort(RNG.random((R, S)) * 4 + 2, axis=-1)
    out = composite(jnp.asarray(rgb, jnp.float32), jnp.asarray(sigma, jnp.float32),
                    jnp.asarray(z, jnp.float32))
    rgb_g, depth_g, acc_g, w_g = gold.composite(rgb, sigma, z)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth_g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["acc"]), acc_g, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]), w_g, atol=1e-5)


def test_composite_opaque_wall_takes_first_sample():
    # A huge sigma at sample k makes alpha_k ~ 1: rgb == color_k, depth == z_k.
    z = jnp.asarray([[2.0, 3.0, 4.0, 5.0]])
    sigma = jnp.asarray([[0.0, 1e8, 0.0, 0.0]])
    rgb = jnp.asarray([[[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1.0]]])
    out = composite(rgb, sigma, z)
    np.testing.assert_allclose(np.asarray(out["rgb"][0]), [0, 1, 0], atol=1e-5)
    np.testing.assert_allclose(float(out["depth"][0]), 3.0, atol=1e-4)


def test_composite_empty_space_transparent():
    z = jnp.broadcast_to(jnp.linspace(2, 6, 16), (1, 16))
    out = composite(jnp.ones((1, 16, 3)), jnp.zeros((1, 16)), z)
    np.testing.assert_allclose(np.asarray(out["acc"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 0.0, atol=1e-6)


def test_composite_background_color():
    z = jnp.broadcast_to(jnp.linspace(2, 6, 8), (1, 8))
    out = composite(jnp.zeros((1, 8, 3)), jnp.zeros((1, 8)), z,
                    background_color=jnp.asarray([1.0, 1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-6)


def test_composite_gradients_match_finite_difference():
    # per-pixel parameter gradient correctness bar (BASELINE.json:5)
    R, S = 3, 8
    rgb = jnp.asarray(RNG.random((R, S, 3)), jnp.float32)
    sigma0 = jnp.asarray(RNG.random((R, S)) * 3, jnp.float32)
    z = jnp.asarray(np.sort(RNG.random((R, S)) * 4 + 2, -1), jnp.float32)

    def loss(sigma):
        return composite(rgb, sigma, z)["rgb"].sum()

    g = np.asarray(jax.grad(loss)(sigma0))
    eps = 1e-3
    for (r, s) in [(0, 0), (1, 3), (2, 7)]:
        sp = sigma0.at[r, s].add(eps)
        sm = sigma0.at[r, s].add(-eps)
        fd = (loss(sp) - loss(sm)) / (2 * eps)
        np.testing.assert_allclose(g[r, s], float(fd), rtol=2e-2, atol=1e-3)
