"""Golden parity: HF WavLMModel / HubertModel (random tiny) vs our encoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch

from slam_llm_tpu.models.wavlm import (
    WavLMConfig,
    WavLMEncoder,
    convert_wavlm,
    feature_lengths,
)
from slam_llm_tpu.utils.hf_loader import _overlay, load_hf_state_dict


def _jax_forward(cfg, host_params_update, audio, audio_mask=None):
    enc = WavLMEncoder(cfg)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(audio), None)
    from flax import linen as nn

    host = jax.tree_util.tree_map(np.asarray, nn.meta.unbox(variables["params"]))
    _overlay(host, host_params_update)
    out, mask = enc.apply(
        {"params": host}, jnp.asarray(audio),
        None if audio_mask is None else jnp.asarray(audio_mask),
    )
    return np.asarray(out), np.asarray(mask)


@pytest.fixture(scope="module")
def audio():
    return np.random.default_rng(0).standard_normal((2, 2000)).astype(np.float32) * 0.1


def _tiny_hf_kwargs():
    return dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
        conv_stride=(5, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, do_stable_layer_norm=False,
        feat_extract_norm="group", hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, activation_dropout=0.0,
    )


def _our_tiny(rel_bias=True, stable=False, norm="group"):
    return WavLMConfig(
        d_model=32, n_heads=2, n_layers=2, ffn_dim=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        conv_pos=16, conv_pos_groups=2,
        num_buckets=32, max_distance=50,
        rel_bias=rel_bias, do_stable_layer_norm=stable, feat_extract_norm=norm,
        dtype=jnp.float32,
    )


def test_wavlm_base_style_parity(tmp_path, audio):
    from transformers import WavLMConfig as HFCfg, WavLMModel

    torch.manual_seed(0)
    hf = WavLMModel(HFCfg(**_tiny_hf_kwargs(), num_buckets=32, max_bucket_distance=50)).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    with torch.no_grad():
        ref = hf(torch.from_numpy(audio)).last_hidden_state.numpy()
    cfg = _our_tiny()
    sub = convert_wavlm(load_hf_state_dict(str(tmp_path)), cfg)
    got, mask = _jax_forward(cfg, sub, audio)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_wavlm_large_style_parity(tmp_path, audio):
    """stable layer norm + per-layer conv LN (the wavlm-large code path)."""
    from transformers import WavLMConfig as HFCfg, WavLMModel

    torch.manual_seed(1)
    kw = _tiny_hf_kwargs()
    kw.update(do_stable_layer_norm=True, feat_extract_norm="layer")
    hf = WavLMModel(HFCfg(**kw, num_buckets=32, max_bucket_distance=50)).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    with torch.no_grad():
        ref = hf(torch.from_numpy(audio)).last_hidden_state.numpy()
    cfg = _our_tiny(stable=True, norm="layer")
    sub = convert_wavlm(load_hf_state_dict(str(tmp_path)), cfg)
    got, _ = _jax_forward(cfg, sub, audio)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_hubert_style_parity(tmp_path, audio):
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(2)
    hf = HubertModel(HubertConfig(**_tiny_hf_kwargs())).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    with torch.no_grad():
        ref = hf(torch.from_numpy(audio)).last_hidden_state.numpy()
    cfg = _our_tiny(rel_bias=False)
    sub = convert_wavlm(load_hf_state_dict(str(tmp_path)), cfg)
    got, _ = _jax_forward(cfg, sub, audio)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def _hf_to_fairseq_schema(sd):
    """Rename an HF Hubert state dict into the fairseq checkpoint schema
    (reverse of the converter's mapping) to exercise convert_hubert_fairseq
    against a real-format dict."""
    out = {}
    for k, v in sd.items():
        nk = k
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, kind = parts[2], parts[3]
            slot = "0" if kind == "conv" else "2"
            nk = f"feature_extractor.conv_layers.{i}.{slot}.{parts[-1]}"
        elif k.startswith("feature_projection.layer_norm."):
            nk = k.replace("feature_projection.layer_norm.", "layer_norm.")
        elif k.startswith("feature_projection.projection."):
            nk = k.replace("feature_projection.projection.", "post_extract_proj.")
        elif k.startswith("encoder.pos_conv_embed.conv."):
            nk = k.replace("encoder.pos_conv_embed.conv.", "encoder.pos_conv.0.")
        elif k.startswith("encoder.layers."):
            nk = (
                k.replace(".attention.", ".self_attn.")
                .replace(".layer_norm.", ".self_attn_layer_norm.")
                .replace(".feed_forward.intermediate_dense.", ".fc1.")
                .replace(".feed_forward.output_dense.", ".fc2.")
            )
        out[nk] = v
    # checkpoints also carry pretraining heads the converter must skip
    out["final_proj.weight"] = np.zeros((4, 32), np.float32)
    out["label_embs_concat"] = np.zeros((10, 4), np.float32)
    return out


def test_hubert_fairseq_checkpoint_parity(tmp_path, audio):
    """fairseq-format HuBERT state dict (reference models/encoder.py:139-155
    loads these via fairseq) -> our encoder, vs HF reference output."""
    from slam_llm_tpu.models.wavlm import convert_hubert_fairseq
    from transformers import HubertConfig, HubertModel

    torch.manual_seed(3)
    hf = HubertModel(HubertConfig(**_tiny_hf_kwargs())).eval()
    with torch.no_grad():
        ref = hf(torch.from_numpy(audio)).last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    fairseq_sd = _hf_to_fairseq_schema(sd)
    cfg = _our_tiny(rel_bias=False)
    sub = convert_hubert_fairseq({"model": fairseq_sd}, cfg)
    got, _ = _jax_forward(cfg, sub, audio)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_feature_lengths_match_hf():
    from transformers import WavLMConfig as HFCfg, WavLMModel

    hf_cfg = HFCfg(**_tiny_hf_kwargs())
    hf = WavLMModel(hf_cfg)
    ours = WavLMConfig(conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2))
    for n in (320, 1000, 2000, 16000):
        assert int(hf._get_feat_extract_output_lengths(n)) == feature_lengths(n, ours)


def test_padding_mask_shapes(audio):
    cfg = _our_tiny()
    enc = WavLMEncoder(cfg)
    mask = np.ones((2, 2000), np.int32)
    mask[1, 1000:] = 0
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(audio), jnp.asarray(mask))
    out, out_mask = enc.apply(variables, jnp.asarray(audio), jnp.asarray(mask))
    assert out.shape[:2] == out_mask.shape
    assert int(out_mask[0].sum()) > int(out_mask[1].sum())
