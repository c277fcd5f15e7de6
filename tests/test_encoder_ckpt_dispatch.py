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
