"""WER + text normalization tests."""

import numpy as np

from slam_llm_tpu.utils.textnorm import (
    EnglishTextNormalizer,
    normalize_file,
    reduce_repeated_words,
)
from slam_llm_tpu.utils.wer import align, compute_wer_files, compute_wer_lists


def test_align_counts():
    counts, path = align("a b c d".split(), "a x c".split())
    # a=cor, b->x sub, c=cor, d ins
    assert counts == {"cor": 2, "sub": 1, "ins": 1, "del": 0}


def test_wer_lists():
    res = compute_wer_lists(["the cat sat", "hello world"], ["the cat sat", "hello word"])
    assert res.words == 5
    assert res.errors == 1
    assert res.wer == 20.0
    assert res.ser == 50.0


def test_wer_perfect():
    res = compute_wer_lists(["a b"], ["a b"])
    assert res.wer == 0.0 and res.ser == 0.0


def test_wer_files_format(tmp_path):
    ref = tmp_path / "gt"
    hyp = tmp_path / "pred"
    ref.write_text("utt1\tthe quick brown fox\nutt2\thello there\n")
    hyp.write_text("utt1\tthe quik brown fox\nutt2\thello there\n")
    detail = tmp_path / "detail"
    res = compute_wer_files(str(ref), str(hyp), str(detail))
    assert res.wer == round(100 / 6, 2)
    text = detail.read_text()
    assert "%WER" in text and "%SER" in text and "diff:" in text
    assert "(quick->quik)" in text


def test_normalizer_basics():
    n = EnglishTextNormalizer()
    assert n("Hello, World!") == "hello world"
    # 's stays (possessive vs "is" is ambiguous); both sides normalize the same
    assert n("it's Mr. Smith's dog") == "it's mister smith's dog"
    assert n("[noise] the cat (laughs) sat") == "the cat sat"
    assert n("I won't go") == "i will not go"


def test_normalizer_numbers():
    n = EnglishTextNormalizer()
    assert n("twenty five dollars") == "25 dollars"
    assert n("one hundred and two") == "102"
    assert n("three thousand four hundred") == "3400"
    # single number words are left alone (whisper normalizer behavior varies;
    # we keep single words to avoid 'one day' -> '1 day' distortions)
    assert n("one day") == "one day"


def test_reduce_repeats():
    assert reduce_repeated_words("hahahahahahahaha") == "ha"
    s = "the cat " * 10
    assert reduce_repeated_words(s.strip()).startswith("the cat")


def test_normalize_file(tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.write_text("utt1 Hello, WORLD!\nutt2 That is fine.\n")
    normalize_file(str(src), str(dst))
    lines = dst.read_text().strip().split("\n")
    assert lines[0] == "utt1\thello world"
    assert lines[1] == "utt2\tthat is fine"


def test_normalizer_no_wrong_sums():
    """Adjacent independent numbers must NOT sum (round-2 review: the old
    parser turned 'nineteen ninety nine' into 118)."""
    n = EnglishTextNormalizer()
    assert n("nineteen ninety nine") == "nineteen 99"
    assert n("agent zero zero seven") == "agent zero zero seven"
    assert n("rooms one and two") == "rooms one and two"
    assert n("seventeen seventy six") == "seventeen 76"
    assert n("five hundred sixty") == "560"


def test_normalizer_punctuation_and_currency():
    n = EnglishTextNormalizer()
    assert n("It costs 5.") == "it costs 5"  # sentence-final period
    assert n("3.14 is pi") == "3.14 is pi"  # decimals survive
    assert n("won’t go") == "will not go"  # curly apostrophe
    assert n("$5") == "5 dollars"  # spoken order
    assert n("$25.50 please") == "25.50 dollars please"
