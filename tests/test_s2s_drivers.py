"""S2S inference drivers: round-batch layout, multi-round history threading,
streaming round — CPU, tiny config (round-1 missing #2)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)

from slam_llm_tpu.data.tokenizer import ByteTokenizer
from slam_llm_tpu.models.llm import LLMConfig
from slam_llm_tpu.models.projector import ProjectorConfig
from slam_llm_tpu.models.s2s import S2SConfig, S2SGenerator, S2SModel, VocabConfig
from slam_llm_tpu.models.whisper import WhisperEncoderConfig
from slam_llm_tpu.pipeline.generate_s2s import (
    S2SSession,
    build_round_batch,
    write_wav,
)


class _Tok(ByteTokenizer):
    def __init__(self, vocab: VocabConfig):
        super().__init__()
        self.vocab_size = vocab.text_vocabsize

    def encode(self, text, add_bos=True):
        ids = [3 + (b % 40) for b in text.encode("utf-8")]
        return ids


@pytest.fixture(scope="module")
def tiny_session(tmp_path_factory):
    v = VocabConfig.tiny_test()
    cfg = S2SConfig(
        llm=dataclasses.replace(LLMConfig.tiny_test(), remat=False),
        vocab=v,
        encoder_name="whisper",
        encoder=WhisperEncoderConfig.tiny_test(),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
    )
    model = S2SModel(cfg)
    tok = _Tok(v)

    # assemble a session without the config machinery (object under test is
    # the round/history/driver logic, not factory resolution)
    import contextlib

    s = object.__new__(S2SSession)
    s.model, s.tokenizer, s.vocab = model, tok, v
    s.mesh = contextlib.nullcontext()
    s.gen = S2SGenerator(model, max_new_tokens=6)
    s.codec = None
    s.history = ""
    s.mel_size = 8
    s.max_audio_s = 30.0
    s.fix_length_audio = -1
    s.system_prompt = "chat"
    s.cfg = None

    # init from a WAV round so the encoder params materialize too
    wav = _tiny_wav(tmp_path_factory.mktemp("wav"))
    batch = build_round_batch(tok, v, "chat", wav_path=wav, mel_size=8)
    params = model.init(jax.random.PRNGKey(0), jax.tree_util.tree_map(jnp.asarray, batch),
                        method="init_all")
    s.params = params
    s._ensure_params = lambda b: params
    return s


def _tiny_wav(tmp_path):
    import wave as wv

    path = str(tmp_path / "in.wav")
    sr = 16000
    t = np.linspace(0, 0.3, int(sr * 0.3), endpoint=False)
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    with wv.open(path, "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return path


def test_round_batch_layout_text():
    v = VocabConfig.tiny_test()
    tok = _Tok(v)
    b = build_round_batch(tok, v, "sys", history="", text_input="hi", mel_size=8)
    L = v.code_layer
    ids = b["input_ids"][0]
    assert ids.shape[0] == L + 1
    text = ids[L]
    # prompt is LEFT-padded to a bucket (compile-shape control); the real
    # layout starts at the first attended position
    left = text.shape[0] - int(b["attention_mask"].sum())
    assert (b["attention_mask"][0, :left] == 0).all()
    assert (text[:left] == v.pad_t).all()
    # prompt region starts input_t, ends eot; input region repeats that pair
    assert text[left] == v.input_t and v.eot in text
    # text round: literal tokens in the input region, answer_t terminal
    assert text[-1] == v.answer_t
    # audio streams: layershifted markers
    assert ids[1][-1] == v.layershift(np.int64(v.answer_a), 1)
    assert b["modality_mask"].sum() == 0  # no audio this round
    assert "audio_mel" not in b


def test_round_batch_layout_wav(tmp_path):
    v = VocabConfig.tiny_test()
    tok = _Tok(v)
    wav = _tiny_wav(tmp_path)
    b = build_round_batch(tok, v, "sys", wav_path=wav, mel_size=8)
    assert "audio_mel" in b
    a_len = int(b["modality_mask"].sum())
    assert a_len == (b["audio_mel"].shape[1] + 1) // 2 // 5


def test_multi_round_history_threading(tiny_session, tmp_path):
    s = tiny_session
    s.history = ""
    t1, wav1, _ = s.run_round(text_input="hello there", keep_history=True)
    assert "USER: hello there" in s.history and "ASSISTANT:" in s.history
    h1 = s.history
    t2, _, _ = s.run_round(text_input="again", keep_history=True)
    assert s.history.startswith(h1)  # second round appends, keeps first
    assert "USER: again" in s.history
    # history is folded into the next prompt
    b = build_round_batch(s.tokenizer, s.vocab, s.system_prompt, history=s.history,
                          text_input="x", mel_size=8)
    b0 = build_round_batch(s.tokenizer, s.vocab, s.system_prompt, history="",
                           text_input="x", mel_size=8)
    assert b["input_ids"].shape[2] > b0["input_ids"].shape[2]


def test_wav_round_and_write(tiny_session, tmp_path):
    s = tiny_session
    wav_in = _tiny_wav(tmp_path)
    text, wav, streams = s.run_round(wav_path=wav_in, keep_history=False)
    assert isinstance(text, str)
    assert streams.shape[0] == s.vocab.code_layer
    # wav writing round-trips through the stdlib reader
    out = str(tmp_path / "out.wav")
    write_wav(out, np.sin(np.linspace(0, 20, 2400)))
    import wave as wv

    with wv.open(out) as f:
        assert f.getnframes() == 2400 and f.getframerate() == 24000


def test_stream_round_chunks(tiny_session, tmp_path):
    s = tiny_session
    chunks = list(s.stream_round(text_input="stream me", stream_stride=2))
    assert len(chunks) >= 1
    assert all(isinstance(c[0], str) for c in chunks)
