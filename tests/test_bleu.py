"""Corpus BLEU (sacrebleu-compatible) + the CoT-ST scorer."""

import json
import math
import subprocess
import sys
from pathlib import Path

import pytest

from slam_llm_tpu.utils.bleu import corpus_bleu, tokenize_13a, tokenize_zh

REPO = Path(__file__).resolve().parents[1]


def test_tokenize_13a_punct_and_digits():
    assert tokenize_13a("Hello, world!") == ["Hello", ",", "world", "!"]
    # period after digit stays attached (mteval-v13a digit rule)
    assert tokenize_13a("it costs 3.50 dollars.") == [
        "it", "costs", "3.50", "dollars", ".",
    ]
    # mteval-v13a only splits hyphens after digits, not between letters
    assert tokenize_13a("state-of-the-art") == ["state-of-the-art"]
    assert tokenize_13a("a 3-way tie") == ["a", "3", "-", "way", "tie"]


def test_tokenize_zh_splits_cjk():
    assert tokenize_zh("我喜欢ML model") == ["我", "喜", "欢", "ML", "model"]


def test_perfect_match_is_100():
    hyps = ["the cat sat on the mat", "a quick brown fox"]
    refs = [[h] for h in hyps]
    score, precisions, bp = corpus_bleu(hyps, refs)
    assert abs(score - 100.0) < 1e-9
    assert all(abs(p - 100.0) < 1e-9 for p in precisions)
    assert bp == 1.0


def test_known_value_hand_computed():
    # hyp: "the the cat" vs ref "the cat sat": tokenized lengths 3/3, bp=1
    # 1-grams: hyp counts {the:2, cat:1}; ref max {the:1, cat:1, sat:1}
    #   clipped matches = 1 + 1 = 2 of 3
    # 2-grams: hyp {the the, the cat}; ref {the cat, cat sat} -> 1 of 2
    # 3-grams: hyp {the the cat}; ref {the cat sat} -> 0 of 1 -> exp smoothing
    #   first zero: p3 = 100/(2*1) = 50
    # 4-grams: no hyp 4-grams (len 3) -> den 0 -> p4 = 0 -> score 0 per
    #   sacrebleu (all orders must be positive). Use effective 3-gram order.
    score, precisions, bp = corpus_bleu(["the the cat"], [["the cat sat"]], max_n=3)
    assert bp == 1.0
    expected = math.exp((math.log(200 / 3) + math.log(50.0) + math.log(50.0)) / 3)
    assert abs(score - expected) < 1e-9


def test_brevity_penalty():
    # hyp 2 tokens vs ref 4 tokens -> bp = exp(1 - 4/2)
    score, _, bp = corpus_bleu(["the cat"], [["the cat sat down"]], max_n=2)
    assert abs(bp - math.exp(1 - 4 / 2)) < 1e-12


def test_multi_reference_closest_length():
    # closest ref length governs bp; a matching short ref avoids the penalty
    _, _, bp = corpus_bleu(["the cat"], [["the cat", "the cat sat down here"]], max_n=2)
    assert bp == 1.0


def test_parity_vs_sacrebleu():
    sacrebleu = pytest.importorskip("sacrebleu")
    import random

    random.seed(0)
    vocab = "the a cat dog sat ran on mat rug fast slow big 猫 狗 3.5 state-of-the-art".split()
    for trial in range(5):
        n = random.randint(1, 30)
        hyps = [" ".join(random.choices(vocab, k=random.randint(1, 15))) for _ in range(n)]
        refs = [" ".join(random.choices(vocab, k=random.randint(1, 15))) for _ in range(n)]
        want = sacrebleu.corpus_bleu(hyps, [refs], lowercase=True, tokenize="13a")
        got, precisions, bp = corpus_bleu([h.lower() for h in hyps], [[r.lower()] for r in refs])
        assert abs(got - want.score) < 1e-9, (trial, got, want.score)
        assert abs(bp - want.bp) < 1e-12
        for g, w in zip(precisions, want.precisions):
            assert abs(g - w) < 1e-9


def test_st_scorer_cli(tmp_path):
    rows = [
        {"gt": "the cat sat down <|de|> die katze hat sich gesetzt",
         "response": "the cat sat down <|de|> die katze hat sich gesetzt"},
        {"gt": "hello there my friend <|de|> hallo du mein freund",
         "response": "hello there my friend <|de|> hallo du mein freund"},
    ]
    f = tmp_path / "results.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows))
    out = subprocess.run(
        [sys.executable, str(REPO / "examples/st_covost2/eval_werbleu.py"), "--file", str(f)],
        capture_output=True, text=True, check=True,
    ).stdout.strip().splitlines()
    wer = json.loads(out[0])
    bleu = json.loads(out[1])
    assert wer["wer"] == 0.0
    assert abs(bleu["bleu"] - 100.0) < 1e-6
    assert bleu["count"] == 2
