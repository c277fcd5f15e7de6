"""VALL-E-X zero-shot TTS inference: AR -> NAR -> EnCodec decode -> wav.

TPU-native mirror of the reference driver
(reference examples/vallex/inference_vallex.py:60-119): given an enrolled
acoustic prompt (EnCodec codes + its transcript) and a target text, sample
codebook 0 autoregressively, fill codebooks 1..L-1 with the NAR stack, and
decode the generated frames to a waveform with the native JAX EnCodec
decoder (models/encodec.py) instead of the torch ``encodec``/Vocos packages.

Prompt codes come from ``tools/extract_encodec.py`` (offline, torch CPU —
mirrors the reference's ``data_pretreatment`` codec-extraction scripts) as
.npy/.json ``(n_q, T)`` arrays.

    python -m slam_llm_tpu.pipeline.inference_vallex \
        --ckpt_path out/vallex_tts/...model.msgpack --llm_name vallex \
        --codec_path encodec_24khz/model.safetensors \
        --prompt_text "..." --prompt_codes prompt.npy \
        --target_text "..." --save_path out.wav
"""

from __future__ import annotations

import argparse
import json
import wave
from typing import Optional, Tuple

import jax
import numpy as np

from slam_llm_tpu.models.encodec import (
    EncodecConfig,
    encodec_decode,
    load_encodec_checkpoint,
)
from slam_llm_tpu.models.vallex import VALLE, VallexConfig


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 24000) -> None:
    pcm = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    pcm16 = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm16.tobytes())


def text_to_ids(text: str, tokenizer, text_vocab: int) -> np.ndarray:
    """Same fallback as data/vallex_dataset.py ``_phoneme_ids``: tokenizer if
    configured, else a char table — clamped into the model's phoneme vocab."""
    if tokenizer is not None and not isinstance(text, (list, np.ndarray)):
        try:
            ids = np.asarray(tokenizer.encode(text), np.int64)
        except Exception:
            ids = np.asarray([ord(c) for c in text], np.int64)
    elif isinstance(text, (list, np.ndarray)):
        ids = np.asarray(text, np.int64)
    else:
        ids = np.asarray([ord(c) for c in text], np.int64)
    return ids % text_vocab


def load_codes(path: str) -> np.ndarray:
    """(n_q, T) int prompt codes from .npy / .json."""
    if path.endswith(".npy"):
        codes = np.load(path)
    else:
        with open(path, encoding="utf-8") as f:
            codes = np.asarray(json.load(f))
    codes = np.asarray(codes, np.int64)
    if codes.ndim == 1:
        codes = codes[None]
    return codes


def synthesize(
    model: VALLE,
    params,
    prompt_text_ids: np.ndarray,
    target_text_ids: np.ndarray,
    prompt_codes: np.ndarray,
    *,
    max_new: int = 600,
    top_k: int = 50,
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
) -> Tuple[np.ndarray, int]:
    """AR (codebook 0) then NAR (codebooks 1..L-1). Returns the GENERATED
    region's codes ``(n_codebooks, T_gen)`` (prompt frames stripped) and the
    number of generated frames. Mirrors reference VALLE.inference_24L
    (models/vallex/vallex_model.py:427-626): the enrolled prompt keeps its
    true codec tokens in every codebook; generation stops at end-of-audio."""
    c = model.cfg
    rng = jax.random.PRNGKey(0) if rng is None else rng
    n_q = min(prompt_codes.shape[0], c.n_codebooks)
    prompt_codes = prompt_codes[:n_q]
    tp = prompt_codes.shape[1]

    text_ids = np.concatenate([prompt_text_ids, target_text_ids])[None]
    text_mask = np.ones_like(text_ids, np.int32)

    audio0 = model.apply(
        params,
        text_ids, text_mask,
        prompt_codes[0][None].astype(np.int32),
        np.asarray([tp], np.int32),
        max_new, rng, top_k, temperature,
        method="infer_ar",
    )
    a0 = np.asarray(audio0[0])
    gen = a0[tp:]
    hits = np.nonzero(gen == c.eos_audio)[0]
    t_gen = int(hits[0]) if hits.size else len(gen)
    if t_gen == 0:
        return np.zeros((c.n_codebooks, 0), np.int32), 0
    t_total = tp + t_gen

    audio_ids = np.zeros((1, c.n_codebooks, t_total), np.int32)
    audio_ids[0, 0] = a0[:t_total]
    audio_ids[0, :n_q, :tp] = prompt_codes
    audio_ids = jax.numpy.asarray(audio_ids)  # infer_nar uses .at[] updates
    audio_mask = np.ones((1, t_total), np.int32)
    audio_ids = model.apply(
        params,
        text_ids, text_mask, audio_ids, audio_mask,
        np.asarray([tp], np.int32),
        method="infer_nar",
    )
    codes = np.asarray(audio_ids[0, :, tp:t_total])
    return codes, t_gen


def main(argv=None):
    ap = argparse.ArgumentParser(description="VALL-E-X TTS inference (TPU)")
    ap.add_argument("--ckpt_path", required=True,
                    help="trained VALLE params (model.msgpack from finetune)")
    ap.add_argument("--llm_name", default="vallex",
                    help="vallex | vallex-tiny-test preset")
    ap.add_argument("--codec_path", required=True,
                    help="EnCodec decoder ckpt (.safetensors/.bin/.msgpack)")
    ap.add_argument("--prompt_text", required=True)
    ap.add_argument("--prompt_codes", required=True,
                    help="(n_q, T) EnCodec codes of the prompt audio "
                         "(.npy/.json; see tools/extract_encodec.py)")
    ap.add_argument("--target_text", required=True)
    ap.add_argument("--save_path", required=True)
    ap.add_argument("--llm_path", default=None, help="tokenizer dir (optional)")
    ap.add_argument("--top_k", type=int, default=50)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--max_new", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from slam_llm_tpu.data.tokenizer import load_tokenizer
    from slam_llm_tpu.utils.checkpoint import load_trainable

    presets = {"vallex": VallexConfig.base_24l, "vallex-tiny-test": VallexConfig.tiny_test}
    cfg = presets[args.llm_name]()
    model = VALLE(cfg)
    tokenizer = load_tokenizer(args.llm_path) if args.llm_path else None

    flat = load_trainable(args.ckpt_path)
    params = {"params": _unflatten(flat)}

    enc_cfg = (
        EncodecConfig.tiny_test()
        if args.llm_name == "vallex-tiny-test"
        else EncodecConfig.encodec_24khz()
    )
    enc_params = load_encodec_checkpoint(args.codec_path, enc_cfg)

    prompt_codes = load_codes(args.prompt_codes)
    codes, t_gen = synthesize(
        model, params,
        text_to_ids(args.prompt_text, tokenizer, cfg.text_vocab),
        text_to_ids(args.target_text, tokenizer, cfg.text_vocab),
        prompt_codes,
        max_new=args.max_new, top_k=args.top_k, temperature=args.temperature,
        rng=jax.random.PRNGKey(args.seed),
    )
    if t_gen == 0:
        raise SystemExit("model emitted end-of-audio immediately; nothing to decode")
    # ids beyond the codec codebook (eos/pad rows of audio_vocab_padded) are
    # not decodable — clamp defensively
    codes = np.clip(codes, 0, enc_cfg.codebook_size - 1)
    wav = encodec_decode(enc_params, codes[None], enc_cfg)[0]
    write_wav(args.save_path, wav, enc_cfg.sampling_rate)
    print(f"wrote {args.save_path}: {t_gen} frames, {wav.shape[0]} samples "
          f"@ {enc_cfg.sampling_rate} Hz")
    return args.save_path


def _unflatten(flat):
    """'a/b/c' msgpack keys -> nested param dict."""
    out = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


if __name__ == "__main__":
    main()
