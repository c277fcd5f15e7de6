from slam_llm_tpu.ops.audio import (
    SAMPLE_RATE,
    N_FFT,
    HOP_LENGTH,
    N_SAMPLES,
    load_audio,
    pad_or_trim,
    mel_filterbank,
    log_mel_spectrogram,
)
