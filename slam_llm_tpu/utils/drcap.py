"""DRCap — zero-shot audio captioning via CLAP projection decoding + RAG.

Reference examples/drcap_zeroshot_aac (+ models/CLAP/ase_model.py:50-61):
train on TEXT ONLY by decoding CLAP text latents; at inference the CLAP
AUDIO latent is PROJECTED onto a support set of caption embeddings
(softmax-weighted combination), closing the audio-text modality gap, and
top-k similar captions are retrieved into the prompt (RAG).

Pieces here (all operating on the native HTSAT+BERT CLAP, models/clap.py):

  * ``build_text_support``: embed a caption database -> (N, D) store;
  * ``projection_decode``: z -> softmax(z @ S^T / temp) @ S
    (reference ase_model.py:56-61);
  * ``retrieve_topk``: top-k similar captions for RAG prompts;
  * ``augment_manifest_with_rag``: preprocessing that adds
    ``similar_captions`` to a jsonl (reference data_preprocess.py);
  * ``encode_captions`` / ``encode_audio_files``: batched jitted embedding.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def projection_decode(z: np.ndarray, support: np.ndarray, temp: float) -> np.ndarray:
    """(B, D) latents -> support-space projection (B, D)
    (reference ase_model.py encode_audio with use_pd)."""
    z = np.asarray(z)
    support = np.asarray(support)
    sim = z @ support.T / temp
    sim = sim - sim.max(axis=1, keepdims=True)
    w = np.exp(sim)
    w = w / w.sum(axis=1, keepdims=True)
    return w @ support


def retrieve_topk(
    z: np.ndarray, support: np.ndarray, captions: Sequence[str], k: int = 3,
    exclude_self: bool = False,
) -> List[List[str]]:
    """Top-k most similar captions per latent (text-to-text RAG retrieval)."""
    sim = np.asarray(z) @ np.asarray(support).T  # (B, N)
    out = []
    for i in range(sim.shape[0]):
        order = np.argsort(-sim[i])
        picks = []
        for j in order:
            if exclude_self and np.isclose(sim[i, j], 1.0, atol=1e-5):
                continue
            picks.append(captions[int(j)])
            if len(picks) == k:
                break
        out.append(picks)
    return out


def encode_captions(
    captions: Sequence[str], clap_apply: Callable, tokenizer,
    max_text_len: int = 64, batch_size: int = 64,
) -> np.ndarray:
    """Embed captions with the CLAP text tower. ``clap_apply(ids, mask)`` is
    a (jitted) callable returning normalized (B, D) embeddings."""
    import jax.numpy as jnp

    outs = []
    for i in range(0, len(captions), batch_size):
        chunk = list(captions[i : i + batch_size])
        pad = batch_size - len(chunk)
        enc = tokenizer(chunk + [""] * pad, padding="max_length", truncation=True,
                        max_length=max_text_len, return_tensors="np")
        z = np.asarray(clap_apply(jnp.asarray(enc["input_ids"]),
                                  jnp.asarray(enc["attention_mask"])))
        outs.append(z[: len(chunk)])
    return np.concatenate(outs, axis=0)


def augment_manifest_with_rag(
    manifest_in: str,
    manifest_out: str,
    support_captions: Sequence[str],
    support_embeds: np.ndarray,
    embed_fn: Callable[[Sequence[str]], np.ndarray],
    k: int = 3,
    batch_size: int = 64,
) -> int:
    """Add ``similar_captions`` (top-k text-to-text retrieval) to each jsonl
    row (reference data_preprocess.py flow). Returns row count."""
    rows = []
    with open(manifest_in, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                rows.append(json.loads(line))
    targets = [str(r.get("target", r.get("text", ""))) for r in rows]
    n = 0
    with open(manifest_out, "w", encoding="utf-8") as out:
        for i in range(0, len(rows), batch_size):
            chunk = targets[i : i + batch_size]
            z = embed_fn(chunk)
            sims = retrieve_topk(z, support_embeds, support_captions, k=k, exclude_self=True)
            for row, sc in zip(rows[i : i + batch_size], sims):
                row["similar_captions"] = sc
                out.write(json.dumps(row) + "\n")
                n += 1
    return n


def _npz_path(path: str) -> str:
    # np.savez auto-appends .npz; normalize so save/load accept the same string
    return path if path.endswith(".npz") else path + ".npz"


def save_support(path: str, captions: Sequence[str], embeds: np.ndarray) -> None:
    np.savez(_npz_path(path), captions=np.asarray(list(captions), dtype=object), embeds=embeds)


def load_support(path: str) -> Tuple[List[str], np.ndarray]:
    d = np.load(_npz_path(path), allow_pickle=True)
    return [str(c) for c in d["captions"]], np.asarray(d["embeds"], np.float32)
