"""Reference-checkpoint import + custom-dataset loader tests."""

import json
import os

import jax
import numpy as np
import pytest

from danerf_tpu.config import NeRFConfig

torch = pytest.importorskip("torch")

CFG = NeRFConfig(hidden_dim=32, num_layers=3, skip_connect_layers=(2,),
                 use_bf16=False, appearance_dim=8, pos_enc_levels=4,
                 dir_enc_levels=2)


def _reference_style_state_dict(cfg):
    """Build a state_dict with the reference's module names/shapes
    (src/models.py:80-103) using torch Linear layers."""
    pdim = 3 * (1 + 2 * cfg.pos_enc_levels)
    ddim = 3 * (1 + 2 * cfg.dir_enc_levels)
    sd = {}
    torch.manual_seed(0)
    in_dim = pdim
    for i in range(cfg.num_layers):
        if i in cfg.skip_connect_layers and i > 0:
            in_dim = cfg.hidden_dim + pdim
        lin = torch.nn.Linear(in_dim, cfg.hidden_dim)
        sd[f"pts_linears.{i}.weight"] = lin.weight.detach()
        sd[f"pts_linears.{i}.bias"] = lin.bias.detach()
        in_dim = cfg.hidden_dim
    for name, i, o in [("density_head", cfg.hidden_dim, 1),
                       ("dir_linear", cfg.hidden_dim + ddim, cfg.hidden_dim // 2),
                       ("appearance_projection", cfg.appearance_dim, cfg.hidden_dim // 2),
                       ("rgb_linear", cfg.hidden_dim // 2, 3)]:
        lin = torch.nn.Linear(i, o)
        sd[f"{name}.weight"] = lin.weight.detach()
        sd[f"{name}.bias"] = lin.bias.detach()
    return sd


def test_convert_state_dict_forward_equivalence():
    """Converted params must reproduce the torch forward exactly."""
    from danerf_tpu.models import nerf_apply
    from danerf_tpu.utils.convert import convert_state_dict

    sd = _reference_style_state_dict(CFG)
    params = convert_state_dict(sd, CFG)
    # shapes follow our (in, out) convention
    assert params["trunk"][0]["w"].shape == (27, 32)
    assert params["trunk"][2]["w"].shape == (32 + 27, 32)
    assert params["appearance_proj"]["w"].shape == (8, 16)

    # torch forward (reference math)
    def enc(x, L):
        outs = [x]
        for i in range(L):
            f = 2.0 ** i
            outs += [torch.sin(f * x), torch.cos(f * x)]
        return torch.cat(outs, -1)

    x = torch.randn(20, 3)
    d = torch.randn(20, 3)
    e = torch.randn(20, 8)
    h = enc(x, CFG.pos_enc_levels)
    ex = h
    for i in range(CFG.num_layers):
        if i in CFG.skip_connect_layers and i > 0:
            h = torch.cat([h, ex], -1)
        h = torch.relu(h @ sd[f"pts_linears.{i}.weight"].T + sd[f"pts_linears.{i}.bias"])
    sig_t = torch.relu(h @ sd["density_head.weight"].T + sd["density_head.bias"])[..., 0]
    hd = torch.relu(torch.cat([h, enc(d, CFG.dir_enc_levels)], -1)
                    @ sd["dir_linear.weight"].T + sd["dir_linear.bias"])
    hd = hd + e @ sd["appearance_projection.weight"].T + sd["appearance_projection.bias"]
    rgb_t = torch.sigmoid(hd @ sd["rgb_linear.weight"].T + sd["rgb_linear.bias"])

    rgb_j, sig_j = nerf_apply(params, CFG, x.numpy(), d.numpy(), e.numpy())
    np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_j), sig_t.numpy(), atol=1e-4)


def test_load_reference_checkpoint_file(tmp_path):
    from danerf_tpu.utils.convert import load_reference_checkpoint

    sd = _reference_style_state_dict(CFG)
    emb = torch.randn(5, CFG.appearance_dim)
    # payload layout from src/train.py:114-125
    ckpt = {"model_state_dict": sd, "appearance_embeddings": emb,
            "loss": 0.01, "psnr": 20.0, "iteration": 1000}
    path = str(tmp_path / "checkpoint_001000.pt")
    torch.save(ckpt, path)

    params, emb_out, meta = load_reference_checkpoint(path, CFG)
    assert emb_out.shape == (5, CFG.appearance_dim)
    assert meta["iteration"] == 1000
    np.testing.assert_allclose(params["rgb"]["w"],
                               sd["rgb_linear.weight"].numpy().T, atol=1e-7)


def test_convert_rejects_layer_mismatch():
    from danerf_tpu.utils.convert import convert_state_dict

    sd = _reference_style_state_dict(CFG)
    with pytest.raises(ValueError):
        convert_state_dict(sd, CFG.replace(num_layers=8))


@pytest.mark.slow
def test_cli_render_from_reference_pt(tmp_path, monkeypatch):
    """CLI render must accept a reference .pt checkpoint directly."""
    from danerf_tpu.cli import main as cli

    # reference-shape checkpoint for the FULL default config
    full = NeRFConfig()
    sd = _reference_style_state_dict(full.replace())
    # _reference_style_state_dict uses CFG dims; rebuild with full dims
    sd = {}
    pdim, ddim = full.pos_enc_dim, full.dir_enc_dim
    torch.manual_seed(0)
    in_dim = pdim
    for i in range(full.num_layers):
        if i in full.skip_connect_layers and i > 0:
            in_dim = full.hidden_dim + pdim
        lin = torch.nn.Linear(in_dim, full.hidden_dim)
        sd[f"pts_linears.{i}.weight"] = lin.weight.detach()
        sd[f"pts_linears.{i}.bias"] = lin.bias.detach()
        in_dim = full.hidden_dim
    for name, i, o in [("density_head", 256, 1), ("dir_linear", 256 + ddim, 128),
                       ("appearance_projection", 32, 128), ("rgb_linear", 128, 3)]:
        lin = torch.nn.Linear(i, o)
        sd[f"{name}.weight"] = lin.weight.detach()
        sd[f"{name}.bias"] = lin.bias.detach()
    ckpt = {"model_state_dict": sd,
            "appearance_embeddings": torch.randn(3, 32), "iteration": 7}
    pt_path = str(tmp_path / "checkpoint_final.pt")
    torch.save(ckpt, pt_path)

    monkeypatch.chdir(tmp_path)
    cli.main(["render", "--scene", "toy", "--dataset_path", str(tmp_path / "none"),
              "--checkpoint", pt_path, "--output_dir", str(tmp_path / "out"),
              "--frames", "1", "--quality", "preview",
              "--width", "12", "--height", "12"])
    assert os.path.exists(tmp_path / "out" / "rgb_000.png")


def test_custom_dataset_loader(tmp_path):
    """Custom branch: transforms.json above dataset_path, last frame = val
    (src/dataset.py:85-124)."""
    from PIL import Image

    from danerf_tpu.data.custom import load_custom_scene

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    frames = []
    for k in range(4):
        Image.fromarray(rng.integers(0, 255, (12, 12, 3), dtype=np.uint8)).save(
            img_dir / f"f_{k}.png")
        frames.append({"file_path": f"f_{k}.png",
                       "transform_matrix": np.eye(4).tolist()})
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump({"w": 12, "h": 12, "camera_angle_x": 0.7, "frames": frames}, f)

    train = load_custom_scene(str(img_dir), "train")
    val = load_custom_scene(str(img_dir), "val")
    assert train.n_images == 3 and val.n_images == 1
    np.testing.assert_allclose(train.focal, 0.5 * 12 / np.tan(0.35), rtol=1e-6)


def test_load_dataset_routes_custom(tmp_path):
    from PIL import Image

    from danerf_tpu.data import load_dataset

    rng = np.random.default_rng(0)
    (tmp_path / "imgs").mkdir()
    frames = []
    for k in range(3):
        Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
            tmp_path / "imgs" / f"{k}.png")
        frames.append({"file_path": f"{k}.png",
                       "transform_matrix": np.eye(4).tolist()})
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump({"w": 8, "h": 8, "camera_angle_x": 0.7, "frames": frames}, f)

    cfg = NeRFConfig(dataset_type="custom", dataset_path=str(tmp_path / "imgs"))
    ds = load_dataset(cfg, "train")
    assert ds.n_images == 2
