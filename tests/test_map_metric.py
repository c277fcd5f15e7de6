"""mAP scorer for spatial QA classification: AP math vs sklearn, end-to-end
over synthetic decode logs (reference scripts/calculate_map.py semantics)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples" / "seld_spatialsoundqa"))

from calculate_map import (  # noqa: E402
    average_precision,
    compute_map,
    mean_average_precision,
    score_predictions,
)


def test_average_precision_matches_sklearn():
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(0)
    for _ in range(20):
        scores = rng.normal(size=50)
        targets = (rng.uniform(size=50) < 0.3).astype(np.float32)
        if targets.sum() == 0:
            targets[0] = 1.0
        ours = average_precision(scores, targets)
        ref = average_precision_score(targets, scores)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_map_over_classes():
    scores = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]])
    targets = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    assert mean_average_precision(scores, targets) == 1.0  # perfect ranking


def test_bow_fallback_scores_exact_mentions_highest():
    labels = ["dog barking", "car engine", "speech"]
    preds = ["a dog is barking in the room", "the sound of speech"]
    s = score_predictions(preds, labels)
    assert s[0].argmax() == 0
    assert s[1].argmax() == 2


def test_end_to_end_logs(tmp_path):
    pred = tmp_path / "p"
    gt = tmp_path / "g"
    pred.write_text("u1\tdog barking nearby\nu2\tcar engine revving\n")
    gt.write_text("u1\tdog barking\nu2\tcar engine\n")
    m = compute_map(str(pred), str(gt), ["dog barking", "car engine", "speech"])
    assert m == 1.0


def test_embed_fn_hook(tmp_path):
    pred = tmp_path / "p"
    gt = tmp_path / "g"
    pred.write_text("u1\talpha\nu2\tbeta\n")
    gt.write_text("u1\tclass a\nu2\tclass b\n")

    def embed(texts):
        # toy embedding space where alpha ~ class a, beta ~ class b
        table = {
            "alpha": [1, 0], "class a": [0.9, 0.1],
            "beta": [0, 1], "class b": [0.1, 0.9],
        }
        return np.array([table[t] for t in texts], np.float32)

    m = compute_map(str(pred), str(gt), ["class a", "class b"], embed_fn=embed)
    assert m == 1.0
