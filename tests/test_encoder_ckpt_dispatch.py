"""Encoder checkpoint dispatch: HF dirs vs torch files route to the right
family converter (reference loads these via transformers / fairseq / custom
code, models/encoder.py) and bad paths fail loudly instead of silently
training random-init weights."""

import numpy as np
import pytest
import torch

from slam_llm_tpu.utils.hf_loader import (
    convert_encoder_checkpoint,
    load_torch_checkpoint,
)


def test_load_torch_checkpoint_unwraps_nests(tmp_path):
    sd = {"w": torch.ones(2, 3)}
    p = tmp_path / "plain.pt"
    torch.save(sd, p)
    assert set(load_torch_checkpoint(str(p))) == {"w"}

    torch.save({"model": sd}, p)  # fairseq
    assert set(load_torch_checkpoint(str(p))) == {"w"}

    torch.save({"state_dict": sd, "epoch": 3}, p)  # lightning-style
    assert set(load_torch_checkpoint(str(p))) == {"w"}


def test_missing_path_fails_loudly():
    with pytest.raises(FileNotFoundError, match="does not exist"):
        convert_encoder_checkpoint("/nonexistent/enc.pth", "spatial_ast", None)


def test_hf_dir_rejected_for_torch_family(tmp_path):
    with pytest.raises(ValueError, match="torch checkpoint file"):
        convert_encoder_checkpoint(str(tmp_path), "spatial_ast", None)


def test_unknown_family_rejected(tmp_path):
    p = tmp_path / "x.pt"
    torch.save({"w": torch.ones(1)}, p)
    with pytest.raises(ValueError, match="no file-checkpoint converter"):
        convert_encoder_checkpoint(str(p), "musicfm", None)


def test_spatialast_file_dispatch(tmp_path):
    """A real .pth with the BAT key schema routes through
    convert_spatialast_torch (the seld README's documented flow)."""
    from test_spatial_ast import TorchSpatialAST
    from slam_llm_tpu.models.spatial_ast import SpatialASTConfig, SpatialASTEncoder

    cfg = SpatialASTConfig.tiny_test()
    grid = (cfg.target_frames // cfg.patch_size // 2, cfg.n_mels // cfg.patch_size // 2)
    ref = TorchSpatialAST(cfg, grid)
    p = tmp_path / "finetuned.pth"
    torch.save({"model": ref.state_dict()}, p)

    params = convert_encoder_checkpoint(str(p), "spatial_ast", cfg)
    assert "bn_mean" in params
    np.testing.assert_allclose(
        params["bn_mean"], ref.bn.running_mean.numpy(), rtol=1e-6
    )


def test_beats_tokenizer_file_dispatch(tmp_path):
    """A tokenizer .pt (no rel-pos keys, quantize_layer + codebook) routes
    through convert_beats_tokenizer and keeps the codebook verbatim."""
    from slam_llm_tpu.models.beats_tokenizer import BEATsTokenizerConfig

    cfg = BEATsTokenizerConfig.tiny_test()
    t = cfg.trunk
    g = torch.Generator().manual_seed(0)
    r = lambda *s: torch.randn(*s, generator=g)  # noqa: E731
    d, f, p, e = t.d_model, t.ffn_dim, t.patch_size, t.patch_embed_dim
    sd = {
        "patch_embedding.weight": r(e, 1, p, p),
        "layer_norm.weight": r(e), "layer_norm.bias": r(e),
        "post_extract_proj.weight": r(d, e), "post_extract_proj.bias": r(d),
        "encoder.pos_conv.0.weight": r(d, d // t.conv_pos_groups, t.conv_pos),
        "encoder.pos_conv.0.bias": r(d),
        "encoder.layer_norm.weight": r(d), "encoder.layer_norm.bias": r(d),
        "quantize_layer.0.weight": r(d, d), "quantize_layer.0.bias": r(d),
        "quantize_layer.2.weight": r(cfg.quant_dim, d),
        "quantize_layer.2.bias": r(cfg.quant_dim),
        "quantize.embedding.weight": r(cfg.quant_n, cfg.quant_dim),
    }
    for i in range(t.n_layers):
        L = f"encoder.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[L + f"self_attn.{proj}.weight"] = r(d, d)
            sd[L + f"self_attn.{proj}.bias"] = r(d)
        sd[L + "self_attn_layer_norm.weight"] = r(d)
        sd[L + "self_attn_layer_norm.bias"] = r(d)
        sd[L + "final_layer_norm.weight"] = r(d)
        sd[L + "final_layer_norm.bias"] = r(d)
        sd[L + "fc1.weight"] = r(f, d)
        sd[L + "fc1.bias"] = r(f)
        sd[L + "fc2.weight"] = r(d, f)
        sd[L + "fc2.bias"] = r(d)

    path = tmp_path / "tokenizer.pt"
    torch.save({"model": sd}, path)
    params = convert_encoder_checkpoint(str(path), "beats_tokenizer", cfg)
    assert set(params) == {"trunk", "quantize_in", "quantize_out", "codebook"}
    layers = params["trunk"]["transformer"]["layers"]
    assert "gru_rel_pos_linear" not in layers["attention"]  # no rel-pos keys
    assert "rel_attn_embed" not in params["trunk"]["transformer"]
    np.testing.assert_allclose(
        params["codebook"], sd["quantize.embedding.weight"].numpy()
    )
    assert layers["fc1"]["kernel"].shape == (t.n_layers, d, f)
