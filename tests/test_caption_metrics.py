"""Caption metrics sanity tests (known-value and ordering properties)."""

import pytest

from slam_llm_tpu.utils.caption_metrics import (
    bleu,
    cider_d,
    compute_caption_metrics,
    meteor_lite,
    rouge_l,
)

REFS = [
    ["a dog barks loudly in the yard"],
    ["rain falls on the roof"],
    ["a man speaks while music plays"],
]
PERFECT = [r[0] for r in REFS]
CLOSE = ["a dog barks in the yard", "rain falls on a roof", "a man talks while music plays"]
BAD = ["quantum entanglement", "seventeen purple ideas", "flying toasters everywhere"]


def test_bleu_perfect_is_one():
    b = bleu(PERFECT, REFS)
    assert all(abs(x - 1.0) < 1e-9 for x in b)


def test_bleu_ordering():
    assert bleu(CLOSE, REFS)[3] > bleu(BAD, REFS)[3]


def test_rouge_perfect():
    assert rouge_l(PERFECT, REFS) == pytest.approx(1.0)
    assert rouge_l(CLOSE, REFS) > rouge_l(BAD, REFS)


def test_cider_ordering():
    perfect = cider_d(PERFECT, REFS)
    close = cider_d(CLOSE, REFS)
    bad = cider_d(BAD, REFS)
    assert perfect > close > bad
    assert bad < 0.5


def test_meteor():
    assert meteor_lite(PERFECT, REFS) > 0.95
    assert meteor_lite(CLOSE, REFS) > meteor_lite(BAD, REFS)
    # stem matching: "talks" vs "talk"
    assert meteor_lite(["the dog talks"], [["a dog talk"]]) > 0.3


def test_aggregate_and_cli(tmp_path):
    gt = tmp_path / "gt"
    pred = tmp_path / "pred"
    gt.write_text("".join(f"u{i}\t{r[0]}\n" for i, r in enumerate(REFS)))
    pred.write_text("".join(f"u{i}\t{c}\n" for i, c in enumerate(CLOSE)))
    from slam_llm_tpu.utils.caption_metrics import main

    m = main(str(gt), str(pred))
    assert set(m) >= {"bleu_1", "bleu_4", "rouge_l", "meteor", "cider"}
    assert 0 < m["meteor"] <= 1


def test_fense_and_spice_hooks():
    """Pluggable SPICE/FENSE (round-1 missing #9): SPIDEr becomes the true
    average when a SPICE scorer is plugged in; FENSE scores similarity with
    a fluency penalty."""
    import numpy as np

    from slam_llm_tpu.utils.caption_metrics import compute_caption_metrics, fense

    cands = ["a dog barks", "water flows"]
    refs = [["a dog barking"], ["water is flowing", "stream sounds"]]

    m = compute_caption_metrics(cands, refs, spice_fn=lambda c, r: 0.2)
    assert m["spice"] == 0.2
    assert abs(m["spider"] - (m["cider"] + 0.2) / 2) < 1e-3  # 4-dp rounding

    # FENSE with a toy embedder: identical strings -> sim 1.0
    vocab = {}

    def embed(texts):
        out = []
        for t in texts:
            v = np.zeros(8)
            for w in t.split():
                v[hash(w) % 8] += 1.0
            out.append(v / max(np.linalg.norm(v), 1e-9))
        return np.stack(out)

    s_no_err = fense(cands, refs, embed)
    s_err = fense(cands, refs, embed, fluency_error_fn=lambda ts: [True, False])
    assert 0 < s_err < s_no_err <= 1.0

    m2 = compute_caption_metrics(cands, refs, fense_embed_fn=embed)
    assert "fense" in m2 and m2["fense"] > 0
