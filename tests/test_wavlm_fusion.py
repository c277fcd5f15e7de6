"""Raw-audio (wavlm/hubert) path through the fusion model + trainer."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.config import TrainConfig
from slam_llm_tpu.models.llm import LLMConfig
from slam_llm_tpu.models.projector import ProjectorConfig
from slam_llm_tpu.models.slam_model import IGNORE_INDEX, SLAMConfig, SLAMModel
from slam_llm_tpu.models.wavlm import WavLMConfig
from slam_llm_tpu.parallel import make_mesh
from slam_llm_tpu.train.state import build_trainer


def _cfg():
    return SLAMConfig(
        llm=LLMConfig.tiny_test(),
        encoder_name="wavlm",
        encoder=dataclasses.replace(WavLMConfig.tiny_test(), dtype=jnp.float32),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
        freeze_encoder=True,
        freeze_llm=True,
    )


def _batch(b=8):
    rng = np.random.default_rng(0)
    s, t_text, audio_len = 2000, 24, 5
    batch = {
        "audio": (rng.standard_normal((b, s)) * 0.1).astype(np.float32),
        "audio_mask": np.ones((b, s), np.int32),
        "input_ids": rng.integers(0, 250, (b, t_text)).astype(np.int64),
        "attention_mask": np.ones((b, t_text), np.int32),
        "labels": rng.integers(0, 250, (b, t_text)).astype(np.int64),
        "modality_mask": np.zeros((b, t_text), np.int32),
    }
    batch["modality_mask"][:, :audio_len] = 1
    batch["labels"][:, : audio_len + 4] = IGNORE_INDEX
    batch["audio_mask"][b // 2 :, 1500:] = 0  # ragged lengths
    return batch


def test_wavlm_fusion_forward_and_step():
    cfg = _cfg()
    model = SLAMModel(cfg)
    mesh = make_mesh(dp=8, fsdp=1, tp=1)
    tc = TrainConfig()
    trainer = build_trainer(model, cfg, tc, mesh)
    batch = _batch()
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    with mesh:
        state, metrics = trainer.train_step(state, trainer.put_batch(batch), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_wavlm_fusion_encode_masking():
    """Padded audio must not change the valid-region projector outputs."""
    cfg = _cfg()
    model = SLAMModel(cfg)
    batch = {k: jnp.asarray(v) for k, v in _batch(b=2).items()}
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    enc, mask = model.apply(params, batch, method="encode")
    assert enc.shape[0] == 2
    assert int(mask[1].sum()) < int(mask[0].sum())
