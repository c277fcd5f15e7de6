"""Golden parity tests: tiny random HF checkpoints (created locally with
torch) -> our converter -> flax forward must match torch logits.

This is the layer-by-layer numeric-parity gate SURVEY.md §7.3 item 2 calls
for, without needing network access to real checkpoints."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch

from slam_llm_tpu.models.llm import CausalLM, LLMConfig
from slam_llm_tpu.models.whisper import WhisperEncoder, WhisperEncoderConfig
from slam_llm_tpu.utils.hf_loader import (
    convert_llama,
    convert_whisper_encoder,
    load_hf_state_dict,
)


@pytest.fixture(scope="module")
def hf_llama(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, rms_norm_eps=1e-5,
        rope_theta=10000.0, max_position_embeddings=128, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    d = tmp_path_factory.mktemp("hf_llama")
    model.save_pretrained(d, safe_serialization=True)
    return model, hf_cfg, d


def test_llama_logits_parity(hf_llama):
    model_t, hf_cfg, d = hf_llama
    cfg = LLMConfig(
        vocab_size=128, d_model=64, n_layers=3, n_heads=4, n_kv_heads=2,
        head_dim=16, ffn_dim=96, rms_eps=1e-5, dtype=jnp.float32,  # fp32 for parity
        remat=False,
    )
    sub = convert_llama(load_hf_state_dict(str(d)), cfg)

    ids = np.array([[1, 5, 9, 22, 77, 3, 8, 100]], dtype=np.int64)
    with torch.no_grad():
        ref = model_t(torch.from_numpy(ids)).logits.numpy()

    model_j = CausalLM(cfg)
    mask = jnp.ones(ids.shape, jnp.int32)
    params = model_j.init(jax.random.PRNGKey(0), jnp.asarray(ids), mask, method="init_all")
    from flax import linen as nn

    raw = nn.meta.unbox(params["params"])
    # overlay converted weights
    from slam_llm_tpu.utils.hf_loader import _overlay

    host = jax.tree_util.tree_map(np.asarray, raw)
    _overlay(host, sub)
    embeds = model_j.apply({"params": host}, jnp.asarray(ids), method="embed")
    got = np.asarray(model_j.apply({"params": host}, embeds, mask))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_llama_parity_bf16_close(hf_llama):
    """bf16 compute should track fp32 logits within bf16 tolerance."""
    model_t, hf_cfg, d = hf_llama
    cfg = LLMConfig(
        vocab_size=128, d_model=64, n_layers=3, n_heads=4, n_kv_heads=2,
        head_dim=16, ffn_dim=96, rms_eps=1e-5, dtype=jnp.bfloat16, remat=False,
    )
    sub = convert_llama(load_hf_state_dict(str(d)), cfg)
    ids = np.array([[1, 5, 9, 22]], dtype=np.int64)
    with torch.no_grad():
        ref = model_t(torch.from_numpy(ids)).logits.numpy()
    model_j = CausalLM(cfg)
    mask = jnp.ones(ids.shape, jnp.int32)
    params = model_j.init(jax.random.PRNGKey(0), jnp.asarray(ids), mask, method="init_all")
    from flax import linen as nn

    host = jax.tree_util.tree_map(np.asarray, nn.meta.unbox(params["params"]))
    from slam_llm_tpu.utils.hf_loader import _overlay

    _overlay(host, sub)
    embeds = model_j.apply({"params": host}, jnp.asarray(ids), method="embed")
    got = np.asarray(model_j.apply({"params": host}, embeds, mask))
    assert np.max(np.abs(got - ref)) < 0.15  # bf16 matmul tolerance


@pytest.fixture(scope="module")
def hf_whisper(tmp_path_factory):
    from transformers import WhisperConfig, WhisperModel

    torch.manual_seed(0)
    hf_cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=16, d_model=32, encoder_layers=2,
        encoder_attention_heads=2, encoder_ffn_dim=128, decoder_layers=1,
        decoder_attention_heads=2, decoder_ffn_dim=64, max_source_positions=50,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=1,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    model = WhisperModel(hf_cfg).eval()
    d = tmp_path_factory.mktemp("hf_whisper")
    model.save_pretrained(d, safe_serialization=True)
    return model, hf_cfg, d


def test_whisper_encoder_parity(hf_whisper):
    model_t, hf_cfg, d = hf_whisper
    cfg = WhisperEncoderConfig(
        n_mels=16, d_model=32, n_heads=2, n_layers=2, max_source_positions=50,
        dtype=jnp.float32, mask_padding=False,
    )
    sub = convert_whisper_encoder(load_hf_state_dict(str(d)), cfg)

    # full-length input (HF whisper encoder asserts full 30s-equivalent input)
    t_mel = 100  # 2 * max_source_positions
    mel = np.random.default_rng(0).standard_normal((1, t_mel, 16)).astype(np.float32)
    with torch.no_grad():
        ref = model_t.encoder(torch.from_numpy(mel).transpose(1, 2)).last_hidden_state.numpy()

    enc = WhisperEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(mel))
    from flax import linen as nn

    host = jax.tree_util.tree_map(np.asarray, nn.meta.unbox(params["params"]))
    from slam_llm_tpu.utils.hf_loader import _overlay

    _overlay(host, sub)
    got, mask = enc.apply({"params": host}, jnp.asarray(mel))
    got = np.asarray(got)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_whisper_sinusoid_table_matches_hf(hf_whisper):
    """Our computed sinusoid table must equal HF's stored embed_positions."""
    model_t, hf_cfg, d = hf_whisper
    from slam_llm_tpu.models.layers import sinusoidal_positions

    stored = model_t.encoder.embed_positions.weight.detach().numpy()
    ours = np.asarray(sinusoidal_positions(hf_cfg.max_source_positions, hf_cfg.d_model))
    np.testing.assert_allclose(ours, stored, atol=1e-5)


def test_bf16_safetensors_load(hf_llama, tmp_path):
    """Official Qwen2/Llama-3/TinyLlama checkpoints ship bf16 safetensors,
    which safetensors.numpy cannot read (numpy has no bfloat16) — the loader
    must go through the torch framework and upcast to fp32."""
    model_t, hf_cfg, _ = hf_llama
    d = tmp_path / "bf16"
    model_t.to(torch.bfloat16).save_pretrained(d, safe_serialization=True)
    model_t.to(torch.float32)  # restore the shared fixture
    sd = load_hf_state_dict(str(d))
    w = sd["model.embed_tokens.weight"]
    assert w.dtype == np.float32
    np.testing.assert_allclose(
        w, model_t.model.embed_tokens.weight.detach().numpy(), atol=1e-2
    )
