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
