"""CTC-filtered hotword biasing parity (reference
examples/contextual_asr/dataset/hotwordsinfer_dataset.py:22-66,185-201)."""

import json

import numpy as np
import pytest

from slam_llm_tpu.utils.hotword_filter import (
    _indel_distance,
    build_ngram_index,
    calculate_similarity_score,
    filter_hotwords,
    find_candidate_names,
    levenshtein_ratio,
)


def _lcs(a: str, b: str) -> int:
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a)):
        for j in range(len(b)):
            dp[i + 1][j + 1] = (
                dp[i][j] + 1 if a[i] == b[j] else max(dp[i][j + 1], dp[i + 1][j])
            )
    return dp[-1][-1]


def test_indel_distance_is_lcs_complement():
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = "".join(rng.choice(list("abcde"), size=rng.integers(0, 10)))
        b = "".join(rng.choice(list("abcde"), size=rng.integers(0, 10)))
        assert _indel_distance(a, b) == len(a) + len(b) - 2 * _lcs(a, b)


def test_levenshtein_ratio_known_values():
    # python-Levenshtein semantics: ratio = (lensum - indel) / lensum
    assert levenshtein_ratio("abc", "abc") == 1.0
    assert levenshtein_ratio("", "") == 1.0
    assert levenshtein_ratio("abc", "") == 0.0
    # "lewis" vs "luis": lcs=3 (l,i,s) -> indel=3, ratio=(9-3)/9
    assert levenshtein_ratio("lewis", "luis") == pytest.approx(6 / 9)


def test_ngram_index_and_candidates():
    names = ["marguerite", "d'artagnan", "porthos"]
    idx = build_ngram_index(names)
    assert "marguerite" in idx["ma"]
    cands = find_candidate_names("i saw marguerite yesterday", idx)
    assert "marguerite" in cands
    assert "porthos" not in cands


def test_similarity_scores_word_ngrams():
    # two-word name must align against two-word windows of the sentence
    s = calculate_similarity_score("anne boleyn", "we met ann boleyn at court")
    assert s > 0.9
    assert calculate_similarity_score("anne boleyn", "completely unrelated text") < 0.5


def test_filter_keeps_high_scorers_or_top_n():
    bias = ["fauchelevent", "thenardier", "gavroche", "cosette", "marius"]
    sent = "then fauchelevant spoke to cosete about the barricade"
    kept = filter_hotwords(sent, bias, probability_threshold=0.95, word_num=2)
    # misspelled matches score <0.95 -> falls back to top word_num=2
    assert len(kept) == 2
    assert set(kept) <= set(bias)
    assert "fauchelevent" in kept and "cosette" in kept

    # exact mention clears the bar even with word_num=1
    kept2 = filter_hotwords(
        "gavroche sang on the barricade", bias, probability_threshold=0.95, word_num=1
    )
    assert "gavroche" in kept2


def test_common_word_stripping_prevents_false_hits():
    bias = ["theodore"]
    sent = "the dog ran there"
    with_common = filter_hotwords(
        sent, bias, common_words={"the", "there", "dog", "ran"}, word_num=0
    )
    assert with_common == []  # nothing left to match after stripping


def test_cli_end_to_end(tmp_path, capsys):
    import sys

    sys.path.insert(0, "examples/contextual_asr")
    from examples.contextual_asr.filter_hotwords import main

    rows = [
        {"key": "u0", "source": "a.wav", "target": "MR FAUCHELEVENT ARRIVED"},
        {"key": "u1", "source": "b.wav", "target": "HELLO WORLD"},
    ]
    manifest = tmp_path / "test.jsonl"
    manifest.write_text("\n".join(json.dumps(r) for r in rows))
    infer = tmp_path / "ref.tsv"
    infer.write_text(
        "u0\tx\t['fauchelevent']\t['fauchelevent', 'thenardier', 'cosette']\n"
        "u1\tx\t[]\t['gavroche', 'marius']\n"
    )
    ctc = tmp_path / "ctc.txt"
    ctc.write_text("mr fauchelevant arrived\nhello world\n")
    out = tmp_path / "out.jsonl"

    rc = main([
        "--manifest", str(manifest), "--output", str(out),
        "--infer-file", str(infer), "--ctc-file", str(ctc),
        "--mode", "filter", "--word-num", "2",
    ])
    assert rc == 0
    got = [json.loads(l) for l in open(out)]
    assert got[0]["hotwords"][0] == "FAUCHELEVENT"
    assert all("hotwords" in r for r in got)
    assert "recall:" in capsys.readouterr().err

    # gt mode passes the reference lists through, uppercased
    rc = main([
        "--manifest", str(manifest), "--output", str(out),
        "--infer-file", str(infer), "--mode", "gt",
    ])
    assert rc == 0
    got = [json.loads(l) for l in open(out)]
    assert got[0]["hotwords"] == ["FAUCHELEVENT"]
    assert got[1]["hotwords"] == []
