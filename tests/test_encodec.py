"""EnCodec JAX decoder vs the in-environment ``transformers.EncodecModel``
oracle — validates the weight-norm fold, causal conv padding, the
ConvTranspose1d->lhs-dilated-conv rewrite with causal right-trim, the LSTM
skip block, and the RVQ embedding-sum. Mirrors the reference's VALL-E-X
decode path (reference examples/vallex/inference_vallex.py:26-32)."""

import jax
import numpy as np
import pytest

from slam_llm_tpu.models.encodec import (
    EncodecConfig,
    convert_encodec_torch_state,
    encodec_decode,
    init_encodec_params,
)


def test_decode_shapes_fast():
    """Random tiny params: (B, n_q, T) codes -> (B, T*stride) finite audio."""
    cfg = EncodecConfig.tiny_test()
    params = init_encodec_params(np.random.default_rng(0), cfg)
    codes = np.random.default_rng(1).integers(0, cfg.codebook_size, (2, 3, 7))
    wav = encodec_decode(params, codes, cfg)
    assert wav.shape == (2, 7 * cfg.frame_stride)
    assert np.isfinite(wav).all()


@pytest.mark.slow
def test_torch_parity_tiny():
    """HF EncodecModel (random init, tiny causal config) vs our converter."""
    import torch
    from transformers import EncodecConfig as HFConfig
    from transformers import EncodecModel

    # num_quantizers = 1000*max_bw // (frame_rate * codebook_nbits); with
    # hop 8 @ 24 kHz (frame_rate 3000) and 5-bit codebooks, 60 kbps -> 4
    hf_cfg = HFConfig(
        target_bandwidths=[15.0, 60.0],
        sampling_rate=24000,
        audio_channels=1,
        hidden_size=16,
        num_filters=4,
        num_residual_layers=1,
        upsampling_ratios=[4, 2],
        codebook_size=32,
        codebook_dim=16,
        use_causal_conv=True,
        num_lstm_layers=2,
        kernel_size=7,
        last_kernel_size=7,
        residual_kernel_size=3,
        dilation_growth_rate=2,
        compress=2,
        normalize=False,
        use_conv_shortcut=True,
    )
    torch.manual_seed(0)
    model = EncodecModel(hf_cfg).eval()
    # codebooks init to zeros in HF; fill with random values so the latent
    # actually exercises the decoder
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()

    cfg = EncodecConfig(
        hidden_size=16, num_filters=4, upsampling_ratios=(4, 2),
        codebook_size=32, num_quantizers=len(model.quantizer.layers),
        num_lstm_layers=2,
    )
    params = convert_encodec_torch_state(model.state_dict(), cfg)

    b, n_q, t = 2, 2, 11
    codes = np.random.default_rng(2).integers(0, cfg.codebook_size, (b, n_q, t))

    with torch.no_grad():
        ref = model.decode(
            torch.as_tensor(codes, dtype=torch.long)[None],  # (1, B, n_q, T)
            audio_scales=[None],
        )[0].numpy()[:, 0]  # (B, samples)

    ours = encodec_decode(params, codes, cfg)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_torch_parity_24khz_shape():
    """Full-size 24 kHz geometry (random weights): converter handles the real
    (8,5,4,2)-ratio, 32-filter, 2-LSTM architecture and 320x upsampling."""
    import torch
    from transformers import EncodecConfig as HFConfig
    from transformers import EncodecModel

    hf_cfg = HFConfig()  # defaults == facebook/encodec_24khz
    torch.manual_seed(1)
    model = EncodecModel(hf_cfg).eval()
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()

    cfg = EncodecConfig.encodec_24khz()
    params = convert_encodec_torch_state(model.state_dict(), cfg)

    b, n_q, t = 1, 8, 9  # 6 kbps -> 8 codebooks
    codes = np.random.default_rng(3).integers(0, cfg.codebook_size, (b, n_q, t))
    with torch.no_grad():
        ref = model.decode(
            torch.as_tensor(codes, dtype=torch.long)[None], audio_scales=[None]
        )[0].numpy()[:, 0]
    ours = encodec_decode(params, codes, cfg)
    assert ours.shape == (b, t * 320) == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
