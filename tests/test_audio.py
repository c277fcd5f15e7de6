"""Audio frontend golden tests.

The reference pipeline is ``whisper.load_audio`` -> ``whisper.pad_or_trim`` ->
``whisper.log_mel_spectrogram`` (reference datasets/speech_dataset.py:93-103).
whisper itself is not installed here, so we verify against the primitives it
is built from: torch.stft for the STFT framing/windowing, and analytic
properties of the slaney mel filterbank (librosa.filters.mel defaults, which
is exactly what whisper's bundled mel_filters.npz contains).
"""

import numpy as np
import pytest
import torch

from slam_llm_tpu.ops import audio


def _whisper_log_mel_torch(x: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Re-derivation of whisper.log_mel_spectrogram using torch.stft + our
    filterbank; used as the golden reference for the full pipeline."""
    audio_t = torch.from_numpy(x)
    window = torch.hann_window(audio.N_FFT)
    stft = torch.stft(
        audio_t, audio.N_FFT, audio.HOP_LENGTH, window=window, center=True,
        pad_mode="reflect", return_complex=True,
    )
    magnitudes = stft[..., :-1].abs() ** 2
    filters = torch.from_numpy(audio.mel_filterbank(n_mels))
    mel_spec = filters @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.numpy().T  # (T, n_mels), time-major like ours


@pytest.fixture(scope="module")
def wav():
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 2, dtype=np.float32) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t) + 0.05 * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def test_log_mel_matches_torch_stft_pipeline(wav):
    ours = audio.log_mel_spectrogram(wav, n_mels=80)
    golden = _whisper_log_mel_torch(wav, n_mels=80)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_log_mel_128(wav):
    ours = audio.log_mel_spectrogram(wav, n_mels=128)
    golden = _whisper_log_mel_torch(wav, n_mels=128)
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_frame_count_30s():
    x = np.zeros(audio.N_SAMPLES, dtype=np.float32)
    m = audio.log_mel_spectrogram(x)
    assert m.shape == (audio.N_FRAMES, 80)  # 3000 frames for 30 s


def test_mel_filterbank_properties():
    fb = audio.mel_filterbank(80)
    assert fb.shape == (80, 201)
    # every filter has positive mass; band edges covered
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak amplitudes decrease with center frequency
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_pad_or_trim():
    x = np.ones(100, dtype=np.float32)
    assert audio.pad_or_trim(x, 160).shape == (160,)
    assert audio.pad_or_trim(x, 160)[100:].sum() == 0
    assert audio.pad_or_trim(x, 50).shape == (50,)


def test_wav_roundtrip(tmp_path):
    import wave

    x = (np.sin(np.linspace(0, 100, 16000)) * 0.3).astype(np.float32)
    p = tmp_path / "t.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    y = audio.load_audio(str(p))
    assert y.shape == x.shape
    np.testing.assert_allclose(x, y, atol=1e-3)


def test_jax_matches_numpy(wav):
    import jax.numpy as jnp

    ours_np = audio.log_mel_spectrogram(wav)
    ours_jnp = np.asarray(audio.log_mel_spectrogram(jnp.asarray(wav), xp=jnp))
    # torch's import swaps the in-process MKL/OpenMP runtime which perturbs
    # XLA-CPU's FFT at ~1e-3 absolute; well below bf16 resolution.
    np.testing.assert_allclose(ours_np, ours_jnp, atol=2e-3, rtol=1e-2)
