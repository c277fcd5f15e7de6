"""Spatial-QA classification mAP over decode logs — native, offline.

Reference `examples/seld_spatialsoundqa/scripts/calculate_map.py` embeds
each predicted sentence with the OpenAI `text-embedding-ada-002` API, scores
cosine similarity against precomputed AudioSet class embeddings, and feeds
sklearn's `average_precision_score`. Here:

* average precision is implemented from scratch (same definition sklearn
  uses: precision integrated over recall steps at each positive);
* the sentence -> per-class score mapping is PLUGGABLE: pass any
  ``embed_fn(texts) -> (N, D)`` (a CLAP/BERT text tower, a SentenceT5, the
  OpenAI API if you have egress) and class-label embeddings are built with
  the same fn; without one, a bag-of-words cosine fallback keeps the metric
  runnable fully offline (exact label mentions still score 1.0).

Usage:
    python examples/seld_spatialsoundqa/calculate_map.py \
        --pred decode_log_pred --gt decode_log_gt --labels class_labels.csv

Log format (both files): ``key\\ttext`` TSV; gt text is "; "-separated class
labels, matching the reference's decode logs.
"""

from __future__ import annotations

import argparse
import re
from typing import Callable, Dict, List, Optional

import numpy as np


def average_precision(scores: np.ndarray, targets: np.ndarray) -> float:
    """AP for one class: mean precision at each positive, ranked by score
    (identical to sklearn.metrics.average_precision_score on binary
    targets)."""
    order = np.argsort(-scores, kind="stable")
    t = targets[order].astype(bool)
    n_pos = int(t.sum())
    if n_pos == 0:
        return float("nan")
    cum_pos = np.cumsum(t)
    ranks = np.arange(1, len(t) + 1)
    precision_at_pos = cum_pos[t] / ranks[t]
    return float(precision_at_pos.sum() / n_pos)


def mean_average_precision(pred_scores: np.ndarray, targets: np.ndarray) -> float:
    """(N, C) class scores vs (N, C) multi-hot targets -> mAP over classes
    that have at least one positive (reference skips none; nan-classes are
    excluded the way sklearn's macro average would error on them)."""
    aps = [
        average_precision(pred_scores[:, k], targets[:, k])
        for k in range(targets.shape[1])
    ]
    aps = [a for a in aps if not np.isnan(a)]
    return float(np.mean(aps)) if aps else 0.0


def _tokenize(text: str) -> List[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def _bow_embed(texts: List[str], vocab: Dict[str, int]) -> np.ndarray:
    out = np.zeros((len(texts), len(vocab)), np.float32)
    for i, t in enumerate(texts):
        for tok in _tokenize(t):
            j = vocab.get(tok)
            if j is not None:
                out[i, j] += 1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-9)


def score_predictions(
    pred_texts: List[str],
    class_labels: List[str],
    embed_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
) -> np.ndarray:
    """(N, C) cosine scores of each predicted sentence against each class
    label, via ``embed_fn`` or the offline bag-of-words fallback."""
    if embed_fn is not None:
        label_emb = np.asarray(embed_fn(class_labels), np.float32)
        pred_emb = np.asarray(embed_fn(pred_texts), np.float32)
        label_emb /= np.maximum(np.linalg.norm(label_emb, axis=1, keepdims=True), 1e-9)
        pred_emb /= np.maximum(np.linalg.norm(pred_emb, axis=1, keepdims=True), 1e-9)
        return pred_emb @ label_emb.T
    vocab = {t: i for i, t in enumerate(sorted({
        tok for lab in class_labels for tok in _tokenize(lab)
    }))}
    return _bow_embed(pred_texts, vocab) @ _bow_embed(class_labels, vocab).T


def _read_tsv(path: str) -> Dict[str, str]:
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            key, _, text = line.partition("\t")
            out[key] = text
    return out


def compute_map(
    pred_path: str,
    gt_path: str,
    class_labels: List[str],
    embed_fn: Optional[Callable[[List[str]], np.ndarray]] = None,
) -> float:
    preds = _read_tsv(pred_path)
    gts = _read_tsv(gt_path)
    keys = sorted(set(preds) & set(gts))
    label2id = {lab.lower(): i for i, lab in enumerate(class_labels)}
    targets = np.zeros((len(keys), len(class_labels)), np.float32)
    for i, k in enumerate(keys):
        for lab in gts[k].split("; "):
            j = label2id.get(lab.strip().lower())
            if j is not None:
                targets[i, j] = 1.0
    scores = score_predictions([preds[k] for k in keys], class_labels, embed_fn)
    return mean_average_precision(scores, targets)


def _load_labels(path: str) -> List[str]:
    """AudioSet-style class_labels_indices csv: index,mid,display_name."""
    labels = []
    with open(path, encoding="utf-8") as f:
        for idx, line in enumerate(f):
            if idx == 0 and line.lower().startswith("index"):
                continue
            labels.append(line.strip().split(",", 2)[-1].strip('"'))
    return labels


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--labels", required=True, help="class_labels_indices csv")
    a = ap.parse_args()
    m = compute_map(a.pred, a.gt, _load_labels(a.labels))
    print(f"mAP: {m:.6f}")
