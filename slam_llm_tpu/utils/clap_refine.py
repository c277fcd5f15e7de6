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
