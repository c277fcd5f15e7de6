"""S2S (SLAM-Omni) inference drivers: online, multi-round, batch, streaming.

TPU-native counterparts of the reference's six generate entries
(``examples/s2s/generate/generate_s2s_{batch,online}[_multi_round|_stream_mini_omni].py``):
one core session object; the mode knob picks the driver. Speech synthesis is
native when ``model_config.codec_decoder_path`` points at a SNAC checkpoint
(models/snac.py) or a CosyVoice one (models/cosyvoice_flow.py + hift.py),
selected by ``model_config.codec_decoder_type``.

    # single round, wav in -> text + wav out
    python -m slam_llm_tpu.pipeline.generate_s2s --config examples/s2s/conf/s2s_qwen.yaml \
        ++ckpt_path=... ++decode_config.mode=online

    # multi-round spoken dialogue (history threaded into the prompt)
    ... ++decode_config.mode=online_multi_round

    # manifest batch decode (pred/gt logs + wavs)
    ... ++decode_config.mode=batch ++dataset_config.val_data_path=test.jsonl

    # chunked streaming (mini-omni style): wav chunks as tokens decode
    ... ++decode_config.mode=online_stream
"""

from __future__ import annotations

import os
import sys
import wave
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from slam_llm_tpu.config import RunConfig, load_run_config
from slam_llm_tpu.models.s2s import S2SGenerator, VocabConfig, trim_generated
from slam_llm_tpu.ops import audio as audio_ops
from slam_llm_tpu.pipeline.common import build_mesh, materialize_params, setup_logger
from slam_llm_tpu.registry import get_custom_model_factory
from slam_llm_tpu.utils.codec_utils import CodecDecoder

logger = setup_logger()

# turn separators, reference generate_s2s_online_multi_round.py:120-246
PROMPT_TEMPLATE = "<SYSTEM>: {}\n {}"
USER_TURN = "USER: {} "
ASSISTANT_TURN = "ASSISTANT: {} "


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 24000) -> None:
    """float32 [-1, 1] -> 16-bit PCM wav (stdlib only; reference uses
    soundfile)."""
    pcm = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def build_round_batch(
    tokenizer,
    vocab: VocabConfig,
    system_prompt: str,
    history: str = "",
    wav_path: Optional[str] = None,
    text_input: Optional[str] = None,
    mel_size: int = 80,
    max_audio_s: float = 30.0,
    fix_length_audio: int = -1,
    text_buckets=(64, 128, 256, 512, 1024),
) -> Dict[str, Any]:
    """One dialogue round -> multi-stream inference batch of 1.

    Layout identical to the training dataset's inference mode
    (data/s2s_dataset.py): prompt region (history folded into the system
    prompt, reference generate_from_wav:91-93) + input region with audio
    placeholders (wav round) or the literal text tokens (text round)."""
    v, L = vocab, vocab.code_layer
    shift = lambda tok, i: int(v.layershift(np.int64(tok), i))

    prompt = PROMPT_TEMPLATE.format(system_prompt, history)
    prompt_ids = [v.input_t] + list(tokenizer.encode(prompt, add_bos=False)) + [v.eot]
    p_len = len(prompt_ids)

    audio_mel = None
    if wav_path is not None:
        raw = audio_ops.load_audio(wav_path)
        raw = audio_ops.pad_or_trim(raw, int(max_audio_s * audio_ops.SAMPLE_RATE))
        audio_mel = audio_ops.log_mel_spectrogram(raw, n_mels=mel_size)
        a_len = (audio_mel.shape[0] + 1) // 2 // 5
        if fix_length_audio > 0:  # must match the TRAINING layout
            a_len = fix_length_audio
        text_region = [v.input_t] + [v.pad_t] * a_len + [v.eot, v.answer_t]
    else:
        text_ids = list(tokenizer.encode(text_input or "", add_bos=False))
        a_len = len(text_ids)
        text_region = [v.input_t] + text_ids + [v.eot, v.answer_t]

    streams: List[List[int]] = []
    for i in range(L):
        row = [shift(v.pad_a, i)] * p_len
        row += [shift(v.input_a, i)] + [shift(v.pad_a, i)] * a_len
        row += [shift(v.eoa, i), shift(v.answer_a, i)]
        streams.append(row)
    streams.append(list(prompt_ids) + text_region)

    input_ids = np.stack([np.asarray(s, np.int64) for s in streams])  # (L+1, T)
    t = input_ids.shape[1]
    # LEFT-pad the prompt to a bucketed length: every distinct dialogue/
    # history length would otherwise recompile the entire jitted decode
    # graph (the generator is left-pad agnostic: cumsum positions +
    # last-valid-index logits)
    from slam_llm_tpu.data.speech_dataset import bucketize

    t_pad = bucketize(t, list(text_buckets))
    left = t_pad - t
    if left:
        pad_cols = np.stack(
            [np.full(left, shift(v.pad_a, i), np.int64) for i in range(L)]
            + [np.full(left, v.pad_t, np.int64)]
        )
        input_ids = np.concatenate([pad_cols, input_ids], axis=1)
    attention_mask = np.concatenate(
        [np.zeros(left, np.int32), np.ones(t, np.int32)]
    )
    modality_mask = np.zeros(t_pad, np.int32)
    if wav_path is not None:
        modality_mask[left + p_len + 1 : left + p_len + 1 + a_len] = 1
    batch = {
        "input_ids": input_ids[None],
        "attention_mask": attention_mask[None],
        "modality_mask": modality_mask[None],
    }
    if audio_mel is not None:
        batch["audio_mel"] = audio_mel[None].astype(np.float32)
        batch["audio_mel_mask"] = np.ones((1, audio_mel.shape[0]), np.int32)
    return batch


class S2SSession:
    """Holds (model, params, generator, codec); runs dialogue rounds."""

    def __init__(self, cfg: RunConfig):
        self.cfg = cfg
        model, tokenizer = get_custom_model_factory(cfg.model_config)(
            cfg.train_config, cfg.model_config
        )
        self.model, self.tokenizer = model, tokenizer
        self.vocab = model.cfg.vocab
        self.mesh = build_mesh(cfg)
        dc = cfg.decode_config
        self.gen = S2SGenerator(
            model,
            max_new_tokens=dc.max_new_tokens,
            do_sample=dc.do_sample,
            temperature=dc.temperature,
            top_k=dc.top_k,
            text_repetition_penalty=getattr(dc, "text_repetition_penalty", dc.repetition_penalty),
            audio_repetition_penalty=getattr(dc, "audio_repetition_penalty", 1.0),
            num_latency_tokens=getattr(dc, "num_latency_tokens", 0),
            decode_text_only=getattr(dc, "decode_text_only", False),
        )
        self.codec = self._setup_codec(cfg)
        self.params = None
        self.history = ""
        self.mel_size = getattr(cfg.dataset_config, "mel_size", 80)
        self.fix_length_audio = getattr(cfg.dataset_config, "fix_length_audio", -1)
        self.max_audio_s = getattr(cfg.dataset_config, "max_audio_length_s", 30.0)
        self.system_prompt = getattr(
            cfg.dataset_config, "prompt", "Conduct a spoken conversation with the user."
        )

    def _setup_codec(self, cfg: RunConfig) -> Optional[CodecDecoder]:
        mc = cfg.model_config
        path = getattr(mc, "codec_decoder_path", None)
        ctype = getattr(mc, "codec_decoder_type", "SNAC")
        if not path:
            return None
        try:
            if ctype.upper() == "SNAC":
                return CodecDecoder.from_snac_checkpoint(path)
            if ctype.lower() == "cosyvoice":
                # a directory holding flow.pt + hift.pt, or "flow.pt:hift.pt"
                if os.path.isdir(path):
                    flow, hift = os.path.join(path, "flow.pt"), os.path.join(path, "hift.pt")
                else:
                    flow, hift = path.split(":", 1)
                return CodecDecoder.from_cosyvoice_checkpoint(flow, hift)
            logger.warning("unknown codec_decoder_type %r; text+tokens only", ctype)
        except Exception as e:  # missing/foreign checkpoint: tokens-only
            logger.warning("%s checkpoint load failed (%s); text+tokens only", ctype, e)
        return None

    def _ensure_params(self, batch):
        if self.params is None:
            self.params = materialize_params(self.model, self.cfg, self.mesh, batch)
        return self.params

    def run_round(
        self, wav_path: Optional[str] = None, text_input: Optional[str] = None,
        keep_history: bool = False,
    ) -> Tuple[str, Optional[np.ndarray], np.ndarray]:
        """One round -> (text_out, waveform | None, trimmed audio streams)."""
        batch = build_round_batch(
            self.tokenizer, self.vocab, self.system_prompt,
            history=self.history if keep_history else "",
            wav_path=wav_path, text_input=text_input, mel_size=self.mel_size,
            max_audio_s=self.max_audio_s, fix_length_audio=self.fix_length_audio,
        )
        params = self._ensure_params(batch)
        with self.mesh:
            out = self.gen.generate(params, batch)  # (1, L+1, T)
        trimmed = trim_generated(out[0], self.vocab)
        text_out = self.tokenizer.decode(
            [int(x) for x in trimmed[-1] if 0 <= int(x) < self.vocab.text_vocabsize]
        ).strip()
        # trim_generated cuts every audio layer at the same end index
        streams = (
            np.stack(trimmed[:-1])
            if trimmed[0].size
            else np.zeros((self.vocab.code_layer, 0), np.int64)
        )

        wav = None
        if self.codec is not None and streams.shape[1] > 8:
            try:
                wav = self.codec.decode(streams)
            except Exception as e:
                logger.warning("vocoder decode failed: %s", e)
        if keep_history:
            user = text_input if text_input is not None else "<audio>"
            self.history = self.history + USER_TURN.format(user) + ASSISTANT_TURN.format(text_out)
        return text_out, wav, streams

    def stream_round(self, wav_path=None, text_input=None, stream_stride: int = 24):
        """Yield (text_chunk, wav_chunk|None) as tokens decode — the
        mini-omni streaming variant."""
        batch = build_round_batch(
            self.tokenizer, self.vocab, self.system_prompt,
            wav_path=wav_path, text_input=text_input, mel_size=self.mel_size,
            max_audio_s=self.max_audio_s, fix_length_audio=self.fix_length_audio,
        )
        params = self._ensure_params(batch)
        # decode CUMULATIVELY and yield the text delta: per-chunk decode
        # corrupts multi-byte characters whose tokens straddle a chunk
        # boundary (ByteTokenizer drops split UTF-8 sequences silently)
        acc_ids: List[int] = []
        prev_text = ""
        with self.mesh:
            for chunk in self.gen.stream_generate(
                params, batch, stream_stride=stream_stride, codec_decoder=self.codec
            ):
                acc_ids.extend(
                    int(x) for x in chunk["text_tokens"][0]
                    if 0 <= int(x) < self.vocab.text_vocabsize
                )
                full = self.tokenizer.decode(acc_ids)
                delta, prev_text = full[len(prev_text):], full
                yield delta, chunk.get("audio")


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------


def run_online(session: S2SSession, cfg: RunConfig, multi_round: bool, stream: bool):
    out_dir = Path(getattr(cfg.decode_config, "decode_log", "/tmp/s2s_out"))
    out_dir.mkdir(parents=True, exist_ok=True)
    mode = "multi-round" if multi_round else ("streaming" if stream else "single")
    print(f"S2S online ({mode}). Enter: <wav_path>  or  t:<text>  (empty line exits)")
    rnd = 0
    for line in sys.stdin:
        line = line.strip()
        if not line:
            break
        wav_path, text_input = (None, line[2:]) if line.startswith("t:") else (line, None)
        if stream:
            pieces, wavs = [], []
            stride = getattr(cfg.decode_config, "stream_stride", 24)
            for text, wav in session.stream_round(wav_path, text_input, stream_stride=stride):
                print(text, end="", flush=True)
                pieces.append(text)
                if wav is not None:
                    wavs.append(wav)
            print()
            if wavs:
                path = str(out_dir / f"round{rnd}.wav")
                write_wav(path, np.concatenate(wavs), session.codec.sample_rate)
                print(f"[audio -> {path}]")
        else:
            text, wav, _ = session.run_round(wav_path, text_input, keep_history=multi_round)
            print(f"ASSISTANT: {text}")
            if wav is not None:
                path = str(out_dir / f"round{rnd}.wav")
                write_wav(path, wav, session.codec.sample_rate)
                print(f"[audio -> {path}]")
        rnd += 1


def run_batch(session: S2SSession, cfg: RunConfig):
    """Manifest decode: {decode_log}_pred/_gt + wav per utterance (reference
    generate_s2s_batch.py)."""
    from slam_llm_tpu.registry import get_custom_dataset_factory

    cfg.dataset_config.inference_mode = True
    ds = get_custom_dataset_factory(cfg.dataset_config)(
        cfg.dataset_config, session.tokenizer, "test"
    )
    log = getattr(cfg.decode_config, "decode_log", "/tmp/s2s_decode")
    wav_dir = Path(log + "_wav")
    wav_dir.mkdir(parents=True, exist_ok=True)
    with open(log + "_pred", "w") as fp, open(log + "_gt", "w") as fg:
        for i in range(len(ds)):
            item = ds[i]
            batch = {
                "input_ids": item["input_ids"][None],
                "attention_mask": np.ones((1, item["input_ids"].shape[1]), np.int32),
                "modality_mask": np.zeros((1, item["input_ids"].shape[1]), np.int32),
            }
            if item.get("audio_mel") is not None:
                batch["audio_mel"] = item["audio_mel"][None].astype(np.float32)
                batch["audio_mel_mask"] = np.ones((1, item["audio_mel"].shape[0]), np.int32)
                ms = item["modality_start"]
                batch["modality_mask"][0, ms : ms + item["audio_length"]] = 1
            params = session._ensure_params(batch)
            with session.mesh:
                out = session.gen.generate(params, batch)
            trimmed = trim_generated(out[0], session.vocab)
            text = session.tokenizer.decode(
                [int(x) for x in trimmed[-1] if 0 <= int(x) < session.vocab.text_vocabsize]
            ).strip()
            key = item.get("key", str(i))
            fp.write(f"{key}\t{text}\n")
            fg.write(f"{key}\t{item.get('target_text') or ''}\n")
            if session.codec is not None and trimmed[0].size > 8:
                streams = np.stack(trimmed[:-1])
                try:
                    write_wav(str(wav_dir / f"{key}.wav"), session.codec.decode(streams),
                              session.codec.sample_rate)
                except Exception as e:
                    logger.warning("vocoder decode failed for %s: %s", key, e)
    logger.info("wrote %s_pred / _gt (+wavs in %s)", log, wav_dir)


def main(cfg: RunConfig):
    session = S2SSession(cfg)
    mode = getattr(cfg.decode_config, "mode", "online")
    if mode == "batch":
        run_batch(session, cfg)
    else:
        run_online(
            session, cfg,
            multi_round="multi_round" in mode,
            stream="stream" in mode,
        )


if __name__ == "__main__":
    main(load_run_config(sys.argv[1:]))
