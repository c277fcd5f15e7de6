"""CLAP-Refine: rerank multi-beam caption candidates by audio-text similarity
(reference examples/slam_aac/utils/clap_refine.py).

Input: several decode logs (one per beam width, ``{log}_pred_beam{K}``) and
the audio latents; output: the candidate whose CLAP similarity to the audio
is highest, per utterance. Works with any scorer exposing
``encode_audio`` / ``encode_text`` / ``similarity`` (models/clap.CLAP)."""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import numpy as np


def read_candidates(paths: Sequence[str]) -> Dict[str, List[str]]:
    """Decode logs (key<TAB>text) -> {key: [cand_beam1, cand_beam2, ...]}."""
    cands: Dict[str, List[str]] = {}
    for p in paths:
        with open(p, encoding="utf-8") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t", 1)
                if not parts or not parts[0]:
                    continue
                cands.setdefault(parts[0], []).append(parts[1] if len(parts) > 1 else "")
    return cands


def clap_refine(
    candidates: Dict[str, List[str]],
    audio_embed_fn: Callable[[str], np.ndarray],  # key -> (D,) normalized
    text_embed_fn: Callable[[List[str]], np.ndarray],  # texts -> (N, D)
) -> Dict[str, str]:
    """Pick the max-similarity candidate per key."""
    out = {}
    for key, texts in candidates.items():
        za = np.asarray(audio_embed_fn(key)).reshape(-1)
        zt = np.asarray(text_embed_fn(texts))
        sims = zt @ za
        out[key] = texts[int(np.argmax(sims))]
    return out


def write_selection(selection: Dict[str, str], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for key, text in selection.items():
            f.write(f"{key}\t{text}\n")


def clap_refine_with_model(
    pred_logs: Sequence[str],
    clap_ckpt: str,
    audio_manifest: str,
    out: str,
    tokenizer_path: str = "bert-base-uncased",
    max_text_len: int = 64,
) -> Dict[str, str]:
    """End-to-end CLAP-Refine with the real (HTSAT+BERT) CLAP: load an ASE
    checkpoint, embed each utterance's audio + every candidate caption, pick
    the max-similarity candidate, write a reranked pred log.

    ``audio_manifest``: the decode-split jsonl ({key, source, ...})."""
    import json

    import jax
    import jax.numpy as jnp
    import torch

    from slam_llm_tpu.models.clap import CLAP, CLAPConfig, convert_ase_torch_state
    from slam_llm_tpu.ops import audio as audio_ops

    cfg = CLAPConfig()
    sd = torch.load(clap_ckpt, map_location="cpu", weights_only=True)
    sd = sd.get("model", sd.get("state_dict", sd))
    params = convert_ase_torch_state(sd, cfg)
    model = CLAP(cfg)

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_path)

    wav_by_key = {}
    with open(audio_manifest, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                row = json.loads(line)
                wav_by_key[row["key"]] = row["source"]

    target_t = cfg.htsat.spec_size * cfg.htsat.freq_ratio

    @jax.jit
    def embed_audio(mel):
        return model.apply(params, mel, method="encode_audio")

    @jax.jit
    def embed_text(ids, mask):
        return model.apply(params, ids, mask, method="encode_text")

    def audio_embed_fn(key):
        wav = audio_ops.load_audio(wav_by_key[key])
        mel = audio_ops.log_mel_spectrogram(wav, n_mels=cfg.htsat.n_mels)
        if mel.shape[0] < target_t:
            mel = np.pad(mel, ((0, target_t - mel.shape[0]), (0, 0)))
        return np.asarray(embed_audio(jnp.asarray(mel[None, :target_t])))[0]

    def text_embed_fn(texts):
        enc = tok(list(texts), padding="max_length", truncation=True,
                  max_length=max_text_len, return_tensors="np")
        return np.asarray(embed_text(
            jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"])
        ))

    cands = read_candidates(pred_logs)
    # keys absent from the manifest must not KeyError after all the
    # embedding work and lose the whole rerank output — skip and report
    missing = [k for k in cands if k not in wav_by_key]
    if missing:
        import sys

        print(f"clap_refine: skipping {len(missing)} keys missing from the "
              f"manifest (e.g. {missing[0]!r})", file=sys.stderr)
        cands = {k: v for k, v in cands.items() if k in wav_by_key}
    sel = clap_refine(cands, audio_embed_fn, text_embed_fn)
    write_selection(sel, out)
    return sel
