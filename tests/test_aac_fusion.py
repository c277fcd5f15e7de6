"""EAT/BEATs fbank path through dataset + fusion model (AAC recipe shape)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)

from helpers import make_corpus
from slam_llm_tpu.config import RunConfig
from slam_llm_tpu.data.audio_dataset import get_audio_dataset
from slam_llm_tpu.data.loader import build_dataloader
from slam_llm_tpu.data.tokenizer import ByteTokenizer
from slam_llm_tpu.models.beats import BEATsEncoderConfig
from slam_llm_tpu.models.llm import LLMConfig
from slam_llm_tpu.models.projector import ProjectorConfig
from slam_llm_tpu.models.slam_model import SLAMConfig, SLAMModel
from slam_llm_tpu.models.vit import ViTEncoderConfig


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return make_corpus(tmp_path_factory.mktemp("aac"), n=4, targets=["a dog barks", "rain falls"])


def _dataset(corpus, encoder_name, **kw):
    cfg = RunConfig().dataset_config
    cfg.train_data_path = str(corpus)
    cfg.val_data_path = str(corpus)
    cfg.encoder_name = encoder_name
    cfg.target_length = 64
    cfg.encoder_projector_ds_rate = 5
    for k, v in kw.items():
        setattr(cfg, k, v)
    return get_audio_dataset(cfg, ByteTokenizer(), "train")


def test_eat_dataset_shapes(corpus):
    ds = _dataset(corpus, "eat")
    item = ds[0]
    assert item["audio_mel"].shape == (64, 128)  # fixed_length target 64
    # eat: (64//2 + 1) // 5 = 6
    assert item["audio_length"] == 6
    batch = ds.collator([ds[0], ds[1]])
    assert batch["audio_mel"].shape == (2, 64, 128)
    assert batch["modality_mask"].sum(axis=1).tolist() == [6, 6]


def test_beats_dataset_shapes(corpus):
    ds = _dataset(corpus, "beats", fixed_length=False)
    item = ds[0]
    t = item["audio_mel"].shape[0]
    assert item["audio_length"] == ((t + 1) // 2) // 5


def test_eat_fusion_forward(corpus):
    ds = _dataset(corpus, "eat")
    dl = build_dataloader(ds, batch_size=2, shuffle=False)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dl)).items() if hasattr(v, "shape")}
    cfg = SLAMConfig(
        llm=LLMConfig.tiny_test(vocab_size=260),
        encoder_name="eat",
        encoder=dataclasses.replace(ViTEncoderConfig.tiny_test(), n_mels=128, dtype=jnp.float32),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
    )
    model = SLAMModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))


def test_beats_fusion_forward(corpus):
    ds = _dataset(corpus, "beats", fixed_length=False)
    dl = build_dataloader(ds, batch_size=2, shuffle=False)
    batch = {k: jnp.asarray(v) for k, v in next(iter(dl)).items() if hasattr(v, "shape")}
    cfg = SLAMConfig(
        llm=LLMConfig.tiny_test(vocab_size=260),
        encoder_name="beats",
        encoder=dataclasses.replace(
            BEATsEncoderConfig.tiny_test(), n_mels=128, patch_size=16, dtype=jnp.float32
        ),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
    )
    model = SLAMModel(cfg)
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
