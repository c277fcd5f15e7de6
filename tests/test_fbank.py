"""Golden tests for the kaldi fbank.

torchaudio is not installed in this image, so the golden reference is an
independent torch implementation of the documented
``torchaudio.compliance.kaldi.fbank`` algorithm (htk_compat, hanning,
dither=0), cross-checked by physical property tests (tone -> correct mel
band, frame-count formula)."""

import math

import numpy as np
import pytest
import torch

from slam_llm_tpu.ops import fbank as fb


@pytest.fixture(scope="module")
def wav():
    rng = np.random.default_rng(0)
    t = np.arange(16000, dtype=np.float32) / 16000
    return (0.4 * np.sin(2 * np.pi * 523.0 * t) + 0.05 * rng.standard_normal(16000)).astype(
        np.float32
    )


def _torch_kaldi_fbank(x: np.ndarray, num_mel_bins=128) -> np.ndarray:
    """Literal torch re-implementation of kaldi fbank (independent of ours)."""
    wav_t = torch.from_numpy(x).double()
    win, hop, n_fft, sr = 400, 160, 512, 16000
    n_frames = 1 + (len(x) - win) // hop
    frames = torch.stack([wav_t[i * hop : i * hop + win] for i in range(n_frames)])
    frames = frames - frames.mean(dim=1, keepdim=True)  # remove_dc_offset
    pre = torch.cat([frames[:, :1], frames[:, :-1]], dim=1)
    frames = frames - 0.97 * pre  # preemphasis
    n = torch.arange(win, dtype=torch.float64)
    window = 0.5 - 0.5 * torch.cos(2 * math.pi * n / (win - 1))  # kaldi hanning
    frames = frames * window
    spec = torch.fft.rfft(torch.nn.functional.pad(frames, (0, n_fft - win)), dim=1)
    power = spec.abs() ** 2
    power = power[:, : n_fft // 2]  # kaldi drops the Nyquist bin

    def mel(f):
        return 1127.0 * torch.log(1.0 + f / 700.0)

    fft_freqs = torch.arange(n_fft // 2, dtype=torch.float64) * (sr / n_fft)
    pts = torch.linspace(mel(torch.tensor(20.0)).item(), mel(torch.tensor(sr / 2.0)).item(),
                         num_mel_bins + 2, dtype=torch.float64)
    mel_f = mel(fft_freqs)
    banks = torch.zeros(num_mel_bins, n_fft // 2, dtype=torch.float64)
    for i in range(num_mel_bins):
        up = (mel_f - pts[i]) / (pts[i + 1] - pts[i])
        down = (pts[i + 2] - mel_f) / (pts[i + 2] - pts[i + 1])
        banks[i] = torch.clamp(torch.minimum(up, down), min=0.0)
    out = torch.log(torch.clamp(power @ banks.T, min=fb.EPS))
    return out.float().numpy()


def test_fbank_matches_torchaudio(wav):
    ours = fb.fbank(wav, num_mel_bins=128)
    golden = _torch_kaldi_fbank(wav, 128)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=1e-4)


def test_fbank_80_bins(wav):
    ours = fb.fbank(wav, num_mel_bins=80)
    golden = _torch_kaldi_fbank(wav, 80)
    np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=1e-4)


def test_eat_preprocess_matches_reference_semantics(wav):
    """Structural parity with reference EAT_preprocess (EAT/EAT.py:5-32)."""
    out = fb.eat_preprocess(wav)
    assert out.shape[1] == 128
    assert out.shape[0] % 16 == 0
    # reference: ((fbank of mean-subtracted) - mean) / (2*std)
    x = wav - wav.mean()
    golden = (_torch_kaldi_fbank(x) - (-4.268)) / (4.569 * 2)
    n = golden.shape[0]
    np.testing.assert_allclose(out[:n], golden, atol=5e-4, rtol=1e-4)
    assert np.abs(out[n:]).max() < 1.0  # zero-pad then normalized


def test_eat_preprocess_fixed_length(wav):
    out = fb.eat_preprocess(wav, target_length=64, fixed_length=True)
    assert out.shape == (64, 128)
    long = fb.eat_preprocess(np.tile(wav, 12), target_length=1024, fixed_length=True)
    assert long.shape == (1024, 128)


def test_beats_preprocess(wav):
    out = fb.beats_preprocess(wav)
    golden = (
        _torch_kaldi_fbank((wav * 32768.0).astype(np.float32)) - 15.41663
    ) / (2 * 6.55582)
    np.testing.assert_allclose(out, golden, atol=5e-4, rtol=1e-4)


def test_tone_peaks_in_correct_mel_band():
    """A pure 1 kHz tone must peak in the band whose HTK-mel center is ~1 kHz."""
    t = np.arange(16000) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    mel = fb.fbank(tone, num_mel_bins=128)
    peak_band = int(mel.mean(axis=0).argmax())
    import numpy as _np

    pts = _np.linspace(1127 * _np.log(1 + 20 / 700), 1127 * _np.log(1 + 8000 / 700), 130)
    centers_hz = 700 * (_np.exp(pts[1:-1] / 1127) - 1)
    assert abs(centers_hz[peak_band] - 1000.0) < 80.0, centers_hz[peak_band]


def test_frame_count_formula():
    for n in (400, 560, 16000, 16001):
        got = fb.fbank(np.zeros(n, np.float32)).shape[0]
        assert got == 1 + (n - 400) // 160


def test_logfbank_psf_semantics():
    """python_speech_features parity properties (AV-HuBERT's frontend;
    the library itself is not installed offline): ceil-framing with zero
    pad, RECTANGULAR window, 1/NFFT power spectrum, natural log."""
    import math

    import numpy as np

    from slam_llm_tpu.ops.fbank import _psf_mel_banks, logfbank_psf

    rng = np.random.default_rng(0)
    x = rng.standard_normal(7000).astype(np.float64) * 1000

    feat = logfbank_psf(x)
    # frame count: 1 + ceil((N - 400) / 160)
    assert feat.shape == (1 + math.ceil((7000 - 400) / 160), 26)

    # frame 0 is the raw (preemphasized) signal, NO window applied:
    pre = np.append(x[0], x[1:] - 0.97 * x[:-1])
    pspec0 = np.abs(np.fft.rfft(pre[:400], 512)) ** 2 / 512
    fb = _psf_mel_banks(26, 512, 16000, 0.0, 8000.0)
    want0 = np.log(np.maximum(pspec0 @ fb.T, np.finfo(np.float64).eps))
    np.testing.assert_allclose(feat[0], want0, rtol=1e-5)

    # filterbank covers DC (lowfreq=0, unlike kaldi's 20 Hz low cut)
    assert fb[:, :3].sum() > 0


def test_stacked_logfbank_pads_and_normalizes():
    import numpy as np

    from slam_llm_tpu.models.avhubert import stacked_logfbank

    rng = np.random.default_rng(1)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    feats = stacked_logfbank(wav, stack=4, n_mels=26)
    # 98 raw frames -> zero-padded to 100 -> 25 stacked (reference zero-pads,
    # never truncates) and per-frame layer_norm over the 104 dims
    assert feats.shape == (25, 104)
    np.testing.assert_allclose(feats.mean(axis=-1), 0.0, atol=1e-4)
    np.testing.assert_allclose(feats.std(axis=-1), 1.0, atol=1e-2)
