"""MusicFM conformer parity vs HF Wav2Vec2ConformerEncoder + frontend shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch

from slam_llm_tpu.models.musicfm import (
    ConformerLayer,
    MusicFMConfig,
    MusicFMEncoder,
)


def _hf_layer(cfg, seed=0):
    from transformers.models.wav2vec2_conformer.modeling_wav2vec2_conformer import (
        Wav2Vec2ConformerConfig,
        Wav2Vec2ConformerEncoderLayer,
    )

    torch.manual_seed(seed)
    hf_cfg = Wav2Vec2ConformerConfig(
        hidden_size=cfg.d_model, num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.ffn_dim, conv_depthwise_kernel_size=cfg.depthwise_kernel,
        position_embeddings_type="rotary", hidden_dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, hidden_act="swish",
    )
    return Wav2Vec2ConformerEncoderLayer(hf_cfg).eval(), hf_cfg


def _convert_layer(sd):
    """HF conformer layer state dict -> our ConformerLayer params."""
    t = lambda w: np.ascontiguousarray(w.T)  # noqa: E731

    def lin(pre, bias=True):
        d = {"kernel": t(sd[pre + ".weight"])}
        if bias:
            d["bias"] = sd[pre + ".bias"]
        return d

    def ln(pre):
        return {"scale": sd[pre + ".weight"], "bias": sd[pre + ".bias"]}

    def bn(pre):
        return {
            "scale": sd[pre + ".weight"], "bias": sd[pre + ".bias"],
            "mean": sd[pre + ".running_mean"], "var": sd[pre + ".running_var"],
        }

    return {
        "ffn1_ln": ln("ffn1_layer_norm"),
        "ffn1_in": lin("ffn1.intermediate_dense"),
        "ffn1_out": lin("ffn1.output_dense"),
        "attn_ln": ln("self_attn_layer_norm"),
        "q_proj": lin("self_attn.linear_q"),
        "k_proj": lin("self_attn.linear_k"),
        "v_proj": lin("self_attn.linear_v"),
        "out_proj": lin("self_attn.linear_out"),
        "conv_ln": ln("conv_module.layer_norm"),
        # HF pointwise convs are conv1d with kernel 1: (out, in, 1)
        "pointwise_conv1": {"kernel": t(sd["conv_module.pointwise_conv1.weight"][:, :, 0])},
        "depthwise_conv": {
            # torch depthwise (C, 1, K) -> flax (K, 1, C)
            "kernel": np.ascontiguousarray(
                np.transpose(sd["conv_module.depthwise_conv.weight"], (2, 1, 0))
            )
        },
        "conv_bn": bn("conv_module.batch_norm"),
        "pointwise_conv2": {"kernel": t(sd["conv_module.pointwise_conv2.weight"][:, :, 0])},
        "ffn2_ln": ln("ffn2_layer_norm"),
        "ffn2_in": lin("ffn2.intermediate_dense"),
        "ffn2_out": lin("ffn2.output_dense"),
        "final_ln": ln("final_layer_norm"),
    }


def test_conformer_layer_parity():
    cfg = MusicFMConfig(
        n_mels=16, conv_dim=8, d_model=32, n_heads=2, n_layers=1,
        ffn_dim=64, depthwise_kernel=7, dtype=jnp.float32,
    )
    layer_t, hf_cfg = _hf_layer(cfg)
    x_np = np.random.default_rng(0).standard_normal((2, 12, 32)).astype(np.float32)

    # HF applies rotary via relative_position_embeddings passed in
    from transformers.models.wav2vec2_conformer.modeling_wav2vec2_conformer import (
        Wav2Vec2ConformerRotaryPositionalEmbedding,
    )

    rotary = Wav2Vec2ConformerRotaryPositionalEmbedding(hf_cfg)
    with torch.no_grad():
        rel = rotary(torch.from_numpy(x_np))
        ref = layer_t(torch.from_numpy(x_np), relative_position_embeddings=rel)[0].numpy()

    sd = {k: v.numpy() for k, v in layer_t.state_dict().items()}
    sub = _convert_layer(sd)
    ours = ConformerLayer(cfg)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x_np), None)
    from flax import linen as nn

    host = jax.tree_util.tree_map(np.asarray, nn.meta.unbox(variables["params"]))
    from slam_llm_tpu.utils.hf_loader import _overlay

    _overlay(host, sub)
    got = np.asarray(ours.apply({"params": host}, jnp.asarray(x_np), None))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_musicfm_encoder_shapes():
    cfg = MusicFMConfig.tiny_test()
    enc = MusicFMEncoder(cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 40, 16)).astype(np.float32))
    mask = np.ones((2, 40), np.int32)
    mask[1, 20:] = 0
    variables = enc.init(jax.random.PRNGKey(0), mel, jnp.asarray(mask))
    out, out_mask = enc.apply(variables, mel, jnp.asarray(mask))
    assert out.shape == (2, 10, cfg.d_model)  # T/4
    assert int(out_mask[1].sum()) == 5
