"""Effect tests: each of the 13 effects on synthetic images with analytic
depth ramps, asserting the cited formulas (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from danerf_tpu.fx import EFFECTS, apply_effect, default_params
from danerf_tpu.fx import imageops as io

RNG = np.random.default_rng(0)
IMG = RNG.integers(0, 255, (24, 24, 3), dtype=np.uint8)
DEPTH = np.broadcast_to(np.linspace(0, 1, 24, dtype=np.float32)[None, :], (24, 24)).copy()


# ------------------------------------------------------------- image ops

def test_gaussian_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = IMG.astype(np.float32)
    want = cv2.GaussianBlur(img, (15, 15), 0)
    got = np.asarray(io.gaussian_blur(jnp.asarray(img), 15, 0.0))
    np.testing.assert_allclose(got, want, atol=0.05)


def test_sobel_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    d = DEPTH.astype(np.float32)
    gx = cv2.Sobel(d, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(d, cv2.CV_32F, 0, 1, ksize=3)
    want = np.sqrt(gx**2 + gy**2)
    got = np.asarray(io.sobel_magnitude(jnp.asarray(d)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_laplacian_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    gray = io.rgb_to_gray(jnp.asarray(IMG, jnp.float32))
    want = cv2.Laplacian(np.asarray(gray), cv2.CV_32F)
    got = np.asarray(io.laplacian(gray))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_hsv_roundtrip_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = IMG.astype(np.float32)
    h, s, v = io.rgb_to_hsv_u8(jnp.asarray(img))
    want = cv2.cvtColor(IMG, cv2.COLOR_RGB2HSV).astype(np.float32)
    np.testing.assert_allclose(np.asarray(h), want[..., 0], atol=1.0)
    np.testing.assert_allclose(np.asarray(s), want[..., 1], atol=1.5)
    np.testing.assert_allclose(np.asarray(v), want[..., 2], atol=0.5)
    back = np.asarray(io.hsv_to_rgb_u8(h, s, v))
    np.testing.assert_allclose(back, img, atol=2.0)


def test_equalize_hist_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    gray = RNG.integers(0, 200, (32, 32), dtype=np.uint8)
    want = cv2.equalizeHist(gray).astype(np.float32)
    got = np.asarray(io.equalize_hist_u8(jnp.asarray(gray, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1.0)


def test_dilate_grows_mask():
    m = jnp.zeros((9, 9)).at[4, 4].set(1.0)
    out = np.asarray(io.dilate3(m))
    assert out[3:6, 3:6].min() == 1.0
    assert out.sum() == 9


def test_bilateral_filter_preserves_step_edge():
    # A hard depth step must survive; smooth noise must shrink.
    step = np.zeros((16, 16), np.float32)
    step[:, 8:] = 1.0
    noisy = step + RNG.normal(0, 0.01, step.shape).astype(np.float32)
    out = np.asarray(io.bilateral_filter(jnp.asarray(noisy), 9, 0.1, 75.0))
    assert abs(out[8, 11] - out[8, 4]) > 0.9          # edge kept
    assert np.abs(out - step).std() < np.abs(noisy - step).std()  # noise reduced


# ------------------------------------------------------------- effects

def test_all_effects_run_with_and_without_depth():
    for name in EFFECTS:
        out = apply_effect(name, IMG, DEPTH)
        assert out.shape == IMG.shape and out.dtype == jnp.uint8, name
        out2 = apply_effect(name, IMG, None)
        assert out2.shape == IMG.shape, name


def test_original_is_identity():
    np.testing.assert_array_equal(np.asarray(apply_effect("Original", IMG)), IMG)


def test_toon_quantization_formula():
    # flat image, no depth edges -> pure quantization floor(c/255*L)/L*255
    flat = np.full((8, 8, 3), 200, np.uint8)
    flat_depth = np.full((8, 8), 0.5, np.float32)
    out = np.asarray(apply_effect("Toon Shader", flat, flat_depth))
    want = np.floor(200 / 255.0 * 5) / 5 * 255.0
    np.testing.assert_allclose(out, want, atol=1.0)


def test_toon_depth_edges_darken():
    # vertical depth discontinuity -> black outline at the edge column
    img = np.full((16, 16, 3), 255, np.uint8)
    d = np.zeros((16, 16), np.float32)
    d[:, 8:] = 1.0
    out = np.asarray(apply_effect("Toon Shader", img, d)).astype(np.float32)
    edge_region = out[4:12, 7:10].mean()
    flat_region = out[4:12, 0:4].mean()
    assert edge_region < flat_region * 0.3


def test_sepia_matrix():
    px = np.zeros((4, 4, 3), np.uint8)
    px[..., 0] = 100  # pure red
    out = np.asarray(apply_effect("Sepia", px))
    np.testing.assert_allclose(out[0, 0], [39, 35, 27], atol=1)  # 100*[.393,.349,.272]


def test_color_boost_increases_saturation():
    cv2 = pytest.importorskip("cv2")
    out = np.asarray(apply_effect("Color Boost", IMG))
    s_in = cv2.cvtColor(IMG, cv2.COLOR_RGB2HSV)[..., 1].astype(float)
    s_out = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)[..., 1].astype(float)
    assert s_out.mean() > s_in.mean() * 1.2


def test_bloom_brightens():
    out = np.asarray(apply_effect("Bloom", IMG)).astype(float)
    assert out.mean() > IMG.astype(float).mean()


def test_vignette_darkens_corners_not_center():
    img = np.full((32, 32, 3), 200, np.uint8)
    out = np.asarray(apply_effect("Vignette", img)).astype(float)
    assert out[16, 16].mean() == pytest.approx(200, abs=2)
    # corner: dist=1 -> factor 1-0.5 = 0.5
    assert out[0, 0].mean() == pytest.approx(100, abs=3)


def test_night_vision_green_only():
    out = np.asarray(apply_effect("Night Vision", IMG))
    assert out[..., 0].max() == 0 and out[..., 2].max() == 0
    assert out[..., 1].max() > 0


def test_film_grain_statistics():
    img = np.full((64, 64, 3), 128, np.uint8)
    out = np.asarray(apply_effect("Film Grain", img)).astype(float)
    resid = out - 128.0
    assert 5 < resid.std() < 15          # 50 * 0.2 = 10
    assert abs(resid.mean()) < 1.0


def test_sketch_background_fades_with_depth():
    out_d = np.asarray(apply_effect("Pencil Sketch", IMG, DEPTH))
    out_n = np.asarray(apply_effect("Pencil Sketch", IMG, None))
    # depth mask only affects the far (right) side
    assert not np.array_equal(out_d[:, 20:], out_n[:, 20:])
    np.testing.assert_allclose(out_d[:, :4], out_n[:, :4], atol=1)


def test_cross_processing_channel_gains():
    px = np.full((8, 8, 3), 100, np.uint8)
    out = np.asarray(apply_effect("Cross Processing", px)).astype(float)
    c = out[4, 4]
    # f = 100/255*[1.1,1.3,0.8]; contrast; *255; center pixel mask ~1.2->clip 1
    f = 100 / 255.0 * np.array([1.1, 1.3, 0.8])
    want = np.clip(((np.clip(f, 0, 1) - 0.5) * 1.4 + 0.5) * 255, 0, 255)
    np.testing.assert_allclose(c, np.floor(want), atol=1.5)


def test_posterize_reduces_palette():
    out = np.asarray(apply_effect("Posterize", IMG))
    # quantized to <= levels+edge values per channel (edges add a few)
    assert len(np.unique(out)) < 30


def test_neon_glow_highlights_depth_edges():
    img = np.full((24, 24, 3), 60, np.uint8)
    d = np.zeros((24, 24), np.float32)
    d[:, 12:] = 1.0
    out = np.asarray(apply_effect("Neon Glow", img, d)).astype(float)
    base = np.asarray(apply_effect("Neon Glow", img, np.zeros((24, 24), np.float32))).astype(float)
    assert out[:, 10:14].mean() > base[:, 10:14].mean() + 5


def test_hologram_scanlines_and_tint():
    img = np.full((50, 20, 3), 200, np.uint8)
    out = np.asarray(apply_effect("Hologram", img, None)).astype(float)
    # channel gains (0.8, 1.0, 0.2): blue heavily suppressed
    assert out[..., 2].mean() < out[..., 1].mean() * 0.4
    # scanlines: row brightness varies periodically
    rows = out[..., 1].mean(axis=1)
    assert rows.std() > 1.0


def test_fog_formula_exact():
    # fog blend (src/post_processor.py:480-493):
    # adj = clip((d - start)/(1 - start), 0, 1)^3 * 0.3; out = img*adj + 255*(1-adj)
    img = np.full((8, 8, 3), 100, np.uint8)
    d = np.full((8, 8), 0.7, np.float32)
    out = np.asarray(apply_effect("Fog", img, d)).astype(float)
    adj = np.clip((0.7 - 0.1) / 0.9, 0, 1) ** 3 * 0.3
    want = 100 * adj + 255 * (1 - adj)
    np.testing.assert_allclose(out, want, atol=1.0)


def test_fog_without_depth_uniform():
    img = np.full((8, 8, 3), 100, np.uint8)
    out = np.asarray(apply_effect("Fog", img, None)).astype(float)
    np.testing.assert_allclose(out, 100 * 0.05 + 255 * 0.95, atol=1.0)


def test_fog_near_stays_clear_far_fogs():
    img = np.full((8, 8, 3), 0, np.uint8)
    near = np.asarray(apply_effect("Fog", img, np.full((8, 8), 1.0, np.float32)))
    far = np.asarray(apply_effect("Fog", img, np.full((8, 8), 0.0, np.float32)))
    # depth=1 (near in the reference's normalized buffer => most visible)
    assert near.mean() < far.mean()


def test_params_override_and_determinism():
    out1 = np.asarray(apply_effect("Vignette", IMG, params={"vignette_strength": 0.9}))
    out2 = np.asarray(apply_effect("Vignette", IMG))
    assert out1.astype(float)[0, 0].mean() < out2.astype(float)[0, 0].mean()
    a = np.asarray(apply_effect("Film Grain", IMG, key=jax.random.key(5)))
    b = np.asarray(apply_effect("Film Grain", IMG, key=jax.random.key(5)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(apply_effect("Film Grain", IMG, key=jax.random.key(6)))
    assert not np.array_equal(a, c)


def test_apply_effect_slug_names():
    """CLI-friendly slug forms resolve to the display names (fog, toon_shader,
    neon-glow); unknown names still raise with the option list."""
    import numpy as np
    import pytest

    from danerf_tpu.fx.effects import apply_effect

    img = np.full((8, 8, 3), 128, np.uint8)
    depth = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8)
    a = apply_effect("Fog", img, depth)
    b = apply_effect("fog", img, depth)
    np.testing.assert_array_equal(a, b)
    c = apply_effect("toon_shader", img, depth)
    assert c.shape == (8, 8, 3)
    with pytest.raises(KeyError):
        apply_effect("not_an_effect", img)
