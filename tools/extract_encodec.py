"""Offline EnCodec code extraction (data prep for the VALL-E-X recipe).

Mirrors the reference's codec-extraction step
(reference examples/vallex/inference_vallex.py:48-57 ``get_codec`` and its
``data_pretreatment/`` scripts): runs the HF ``facebook/encodec_24khz``
ENCODER on CPU (torch — a data-prep dependency only; TPU inference uses the
native JAX decoder in slam_llm_tpu/models/encodec.py) and writes ``(n_q, T)``
codes per utterance.

  # single wav -> .npy (inference prompt)
  python tools/extract_encodec.py --wav prompt.wav --out prompt.npy

  # jsonl manifest {key, source, target} -> training jsonl with audio_tokens
  python tools/extract_encodec.py --jsonl train.jsonl --out train_codes.jsonl

Requires soundfile or scipy-readable wavs (16-bit PCM).
"""

from __future__ import annotations

import argparse
import json
import sys
import wave
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def read_wav(path: str):
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        raw = f.readframes(n)
        width = f.getsampwidth()
        ch = f.getnchannels()
    if width != 2:
        raise ValueError(f"{path}: only 16-bit PCM wavs supported, got width {width}")
    pcm = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1)
    return pcm, sr


def resample_linear(x: np.ndarray, sr: int, target: int) -> np.ndarray:
    if sr == target:
        return x
    t_out = int(round(len(x) * target / sr))
    src = np.linspace(0.0, len(x) - 1, t_out)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, len(x) - 1)
    frac = (src - lo).astype(np.float32)
    return x[lo] * (1 - frac) + x[hi] * frac


def build_encoder(model_path: str, bandwidth: float):
    import torch
    from transformers import EncodecModel

    model = EncodecModel.from_pretrained(model_path).eval()

    def encode(pcm: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            wav = torch.as_tensor(pcm, dtype=torch.float32)[None, None]
            out = model.encode(wav, bandwidth=bandwidth)
            # (nb_frames=1, B=1, n_q, T)
            return out.audio_codes[0, 0].numpy().astype(np.int32)

    return encode, model.config.sampling_rate


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", help="single wav -> --out .npy")
    ap.add_argument("--jsonl", help="manifest {key, source, target} -> --out jsonl")
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="facebook/encodec_24khz",
                    help="HF EnCodec model dir or hub id")
    ap.add_argument("--bandwidth", type=float, default=6.0,
                    help="kbps; 6.0 -> 8 codebooks (reference setting)")
    args = ap.parse_args(argv)

    encode, sr_model = build_encoder(args.model, args.bandwidth)

    if args.wav:
        pcm, sr = read_wav(args.wav)
        codes = encode(resample_linear(pcm, sr, sr_model))
        np.save(args.out, codes)
        print(f"{args.out}: codes {codes.shape}")
        return

    if not args.jsonl:
        raise SystemExit("pass --wav or --jsonl")
    n = 0
    with open(args.jsonl, encoding="utf-8") as fin, open(args.out, "w", encoding="utf-8") as fout:
        for line in fin:
            if not line.strip():
                continue
            item = json.loads(line)
            pcm, sr = read_wav(item["source"])
            codes = encode(resample_linear(pcm, sr, sr_model))
            fout.write(json.dumps({
                "key": item.get("key", str(n)),
                "phonemes": item.get("target", item.get("phonemes", "")),
                "audio_tokens": codes.tolist(),
            }) + "\n")
            n += 1
    print(f"{args.out}: {n} utterances")


if __name__ == "__main__":
    main()
