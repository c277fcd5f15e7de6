"""S2S (SLAM-Omni) tests: vocab math, dataset streams, parallel loss,
jitted parallel generation with EOT/EOA stopping, codec layouts."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import write_wav
from slam_llm_tpu.data.s2s_dataset import S2SDatasetJsonl, group_answer_tokens
from slam_llm_tpu.data.tokenizer import ByteTokenizer
from slam_llm_tpu.models.llm import LLMConfig
from slam_llm_tpu.models.projector import ProjectorConfig
from slam_llm_tpu.models.s2s import (
    S2SConfig,
    S2SGenerator,
    S2SModel,
    VocabConfig,
    trim_generated,
)
from slam_llm_tpu.models.whisper import WhisperEncoderConfig
from slam_llm_tpu.utils.codec_utils import (
    snac_answer_token_layout,
    snac_streams_to_codebooks,
)


def test_vocab_derivations():
    v = VocabConfig()
    assert v.padded_text_vocabsize == 152000
    assert v.padded_audio_vocabsize == 4160
    assert v.total_vocabsize == 152000 + 7 * 4160
    assert v.eot == 151936 and v.pad_t == 151937
    assert v.eoa == 4096 and v.pad_a == 4097
    # layershift parity with reference snac_utils.layershift(stride=4160, shift=152000)
    assert int(v.layershift(5, 2)) == 5 + 152000 + 2 * 4160


class _Tok(ByteTokenizer):
    """Byte tokenizer folded into the tiny 64-entry text vocab."""

    def encode(self, text, add_bos=True):
        return [b % 60 for b in text.encode("utf-8")]


@pytest.fixture(scope="module")
def s2s_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("s2s")
    manifest = d / "train.jsonl"
    rows = []
    for i in range(4):
        wav = write_wav(d / f"q{i}.wav", seconds=0.4, freq=300 + 200 * i, seed=i)
        rows.append(
            {
                "key": f"q{i}",
                "source_wav": str(wav),
                "source_text": f"question {i}",
                "target_text": "sure thing",
                "target_token": list(range(3 * 6)),  # grouped stream, 6 frames of 3
            }
        )
    manifest.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return manifest


def _ds_config(manifest, vocab):
    class C:
        pass

    c = C()
    c.train_data_path = str(manifest)
    c.val_data_path = str(manifest)
    c.vocab_config = vocab
    c.task_type = "s2s"
    c.mel_size = 8
    c.max_audio_length_s = 1.0
    c.text_buckets = [96, 160, 256]
    c.prompt = "Answer."
    c.inference_mode = False
    c.fix_length_audio = -1
    c.num_latency_tokens = 0
    return c


def test_group_answer_tokens():
    v = VocabConfig.tiny_test()
    out = group_answer_tokens(list(range(9)), 3, 1, v.pad_a, v.eoa)
    assert out.shape == (3, 5)  # 1 latency + 3 frames + 1 eoa
    np.testing.assert_array_equal(out[:, 0], [v.pad_a] * 3)
    np.testing.assert_array_equal(out[0, 1:4], [0, 3, 6])
    assert (out[:, 4] == v.eoa).all()


def test_dataset_stream_layout(s2s_corpus):
    v = VocabConfig.tiny_test()
    ds = S2SDatasetJsonl(_ds_config(s2s_corpus, v), _Tok(), "train")
    item = ds[0]
    L = v.code_layer
    ids, labels = item["input_ids"], item["labels"]
    assert ids.shape[0] == L + 1 and labels.shape == ids.shape
    p, a = item["prompt_length"], item["audio_length"]
    header = item["header_length"]
    assert header == p + a + 3
    # text stream prompt markers
    assert ids[L, 0] == v.input_t and ids[L, p - 1] == v.eot
    # audio stream 1 input region markers (layershifted)
    assert ids[1, p] == v.layershift(v.input_a, 1)
    assert ids[1, header - 2] == v.layershift(v.eoa, 1)
    assert ids[1, header - 1] == v.layershift(v.answer_a, 1)
    # labels masked over the header
    assert (labels[:, :header] == -100).all()
    # audio answer labels are UNshifted codebook ids; inputs are shifted
    t_ans = labels[0, header : header + 3]
    assert (t_ans < v.padded_audio_vocabsize).all()
    assert (ids[0, header] == v.layershift(labels[0, header], 0)).all()
    # modality span inside input region placeholders
    assert item["modality_start"] == p + 1


def test_collator_static_shapes(s2s_corpus):
    v = VocabConfig.tiny_test()
    ds = S2SDatasetJsonl(_ds_config(s2s_corpus, v), _Tok(), "train")
    batch = ds.collator([ds[0], ds[1]])
    assert batch["input_ids"].shape[2] in (96, 160, 256)
    assert batch["input_ids"].shape[:2] == (2, v.code_layer + 1)
    assert batch["labels"].shape == batch["input_ids"].shape
    assert batch["modality_mask"].sum(axis=1).tolist() == [
        ds[0]["audio_length"], ds[1]["audio_length"]
    ]


@pytest.fixture(scope="module")
def s2s_model(s2s_corpus):
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
    ds = S2SDatasetJsonl(_ds_config(s2s_corpus, v), _Tok(), "train")
    batch = {k: jnp.asarray(x) for k, x in ds.collator([ds[0], ds[1]]).items()
             if hasattr(x, "shape")}
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    return cfg, model, params, batch, ds


def test_s2s_forward_loss(s2s_model):
    cfg, model, params, batch, ds = s2s_model
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["audio_loss"].shape == (cfg.vocab.code_layer,)
    assert np.isfinite(np.asarray(out["audio_loss"])).all()


@pytest.mark.slow
def test_s2s_group_decode_adapter(s2s_corpus):
    v = VocabConfig.tiny_test()
    cfg = S2SConfig(
        llm=dataclasses.replace(LLMConfig.tiny_test(), remat=False),
        vocab=v, encoder_name="whisper", encoder=WhisperEncoderConfig.tiny_test(),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
        group_decode=True,
    )
    model = S2SModel(cfg)
    ds = S2SDatasetJsonl(_ds_config(s2s_corpus, v), _Tok(), "train")
    batch = {k: jnp.asarray(x) for k, x in ds.collator([ds[0]]).items() if hasattr(x, "shape")}
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    assert "group_decode_adapter" in params["params"]


def test_s2s_generate_shapes_and_stopping(s2s_model):
    cfg, model, params, batch, ds = s2s_model
    v = cfg.vocab
    gen = S2SGenerator(model, max_new_tokens=6)
    inf_batch = {k: x for k, x in batch.items() if k != "labels"}
    out = gen.generate(params, inf_batch)
    assert out.shape == (2, v.code_layer + 1, 6)
    # all audio tokens in valid (unshifted) range; text tokens in text range
    assert (out[:, : v.code_layer] < v.padded_audio_vocabsize).all()
    assert (out[:, v.code_layer] < v.padded_text_vocabsize).all()

    trimmed = trim_generated(out[0], v)
    assert len(trimmed) == v.code_layer + 1


def test_snac_layout_roundtrip():
    flat = []
    for frame in range(4):
        flat.append(-1)  # '#' slot, value unused
        flat += [100 * (j + 1) + frame for j in range(7)]
    streams, audio_len = snac_answer_token_layout(flat)
    assert streams.shape[0] == 7
    assert audio_len == 4 + 8
    cbs = snac_streams_to_codebooks(streams)
    # 4 real frames + 1 trailing slot holding the EOA stagger
    assert [c.shape for c in cbs] == [(1, 5), (1, 10), (1, 20)]
    # codebook 0 = layer 0 tokens (delayed by 1 in the stagger)
    np.testing.assert_array_equal(cbs[0][0, :4], [100, 101, 102, 103])
    np.testing.assert_array_equal(cbs[1][0, 0::2][:4], [200, 201, 202, 203])  # layer 1
    np.testing.assert_array_equal(cbs[1][0, 1::2][:4], [500, 501, 502, 503])  # layer 4


@pytest.mark.slow  # heavyweight; covered per-feature by the fast tier
def test_stream_generate_matches_batch(s2s_model):
    """Chunked streaming must produce exactly the same tokens as one-shot
    generation (greedy), with early stop on EOT+EOA."""
    cfg, model, params, batch, ds = s2s_model
    v = cfg.vocab
    gen = S2SGenerator(model, max_new_tokens=8)
    inf_batch = {k: x for k, x in batch.items() if k != "labels"}
    full = gen.generate(params, inf_batch, max_new_tokens=8)
    chunks = list(gen.stream_generate(params, inf_batch, stream_stride=3, max_new_tokens=8))
    audio = np.concatenate([c["audio_tokens"] for c in chunks], axis=2)
    text = np.concatenate([c["text_tokens"] for c in chunks], axis=1)
    n = audio.shape[2]
    np.testing.assert_array_equal(audio, full[:, : v.code_layer, :n])
    np.testing.assert_array_equal(text, full[:, v.code_layer, :n])


@pytest.mark.slow
def test_s2s_generate_to_waveform(s2s_corpus):
    """E2E audio out (round-1 missing #1): generate tokens with a 7-layer
    S2S model, un-stagger to SNAC codebooks, decode NATIVELY with the JAX
    SNAC decoder -> finite, non-silent waveform."""
    from slam_llm_tpu.models.snac import SNACConfig, init_snac_params
    from slam_llm_tpu.utils.codec_utils import CodecDecoder

    v = dataclasses.replace(VocabConfig.tiny_test(), code_layer=7)
    cfg = S2SConfig(
        llm=dataclasses.replace(LLMConfig.tiny_test(), remat=False),
        vocab=v,
        encoder_name="whisper",
        encoder=WhisperEncoderConfig.tiny_test(),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
    )
    model = S2SModel(cfg)
    ds = S2SDatasetJsonl(_ds_config(s2s_corpus, v), _Tok(), "train")
    batch = {k: jnp.asarray(x) for k, x in ds.collator([ds[0]]).items() if hasattr(x, "shape")}
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")

    gen = S2SGenerator(model, max_new_tokens=12)
    inf_batch = {k: x for k, x in batch.items() if k != "labels"}
    out = gen.generate(params, inf_batch)  # (1, 8, 12)
    streams = np.asarray(out[0, : v.code_layer])  # staggered (7, T)

    snac_cfg = SNACConfig.snac_24khz()
    dec = CodecDecoder(
        codec_type="snac",
        snac_params=init_snac_params(np.random.default_rng(0), snac_cfg),
        snac_cfg=snac_cfg,
    )
    wav = dec.decode(streams)
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert wav.shape[0] % 512 == 0  # 512x upsampling of whole latent frames
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() > 1e-6  # non-silent


def test_specaug_masks():
    from slam_llm_tpu.ops.specaug import spec_augment

    mel = np.ones((100, 80), np.float32) * 5.0
    rng = np.random.default_rng(0)
    out = spec_augment(mel, mask_value=0.0, rng=rng)
    assert out.shape == mel.shape
    assert (out == 0.0).any()  # something masked
    assert (out == 5.0).any()  # not everything


def test_trim_generated_any_layer_eoa_fallback():
    """The generator freezes all audio layers to pads after the FIRST EOA
    (any layer, like the reference); with the staggered layout the last
    layer never emits EOA, so trim must cut at the first any-layer EOA
    instead of keeping the max_new pad tail."""
    from slam_llm_tpu.models.s2s import VocabConfig

    v = VocabConfig()
    L = v.code_layer
    max_new, n_frames = 40, 10
    toks = np.full((L + 1, max_new), v.pad_a, np.int64)
    toks[L, :] = v.pad_t
    for l in range(L):  # stagger: layer l delayed by l+1 slots
        toks[l, l + 1 : l + 1 + n_frames] = 100 + l
    toks[0, n_frames + 1] = v.eoa  # layer 0's EOA freezes the rest
    toks[L, :3] = 5
    toks[L, 3] = v.eot
    out = trim_generated(toks, v)
    assert all(len(r) == n_frames + 1 for r in out[:L])
    assert not any((np.asarray(r) == v.eoa).any() for r in out[:L])
    assert len(out[L]) == 3

    # no EOA at all: strip the trailing all-pad tail
    toks2 = toks.copy()
    toks2[0, n_frames + 1] = 100
    out2 = trim_generated(toks2, v)
    assert all(len(r) == n_frames + 1 + 6 for r in out2[:L])  # last layer data ends at 6+1+n_frames


def test_snac_frame_window_matches_full_unstagger():
    """Windowed (streaming) un-stagger over the full history must equal the
    one-shot un-stagger — chunk boundaries lose no frames."""
    from slam_llm_tpu.utils.codec_utils import snac_frame_window, snac_num_frames

    rng = np.random.default_rng(3)
    T = 31
    streams = rng.integers(0, 4096, (7, T)).astype(np.int64)
    full = snac_streams_to_codebooks(streams)
    nf = snac_num_frames(streams)
    assert nf == T - 7
    pieces = [snac_frame_window(streams, f0, min(f0 + 7, nf)) for f0 in range(0, nf, 7)]
    for k in range(3):
        got = np.concatenate([p[k] for p in pieces], axis=1)
        np.testing.assert_array_equal(got, full[k])
