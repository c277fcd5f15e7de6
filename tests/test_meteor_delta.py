"""Quantify METEOR-lite's approximation error against nltk's METEOR.

Round-2 verdict: "commit a fixture-based comparison so the approximation
error is a number, not a docstring". The reference scores with aac-metrics'
Java METEOR 1.5 (paraphrase tables, not available offline); nltk implements
the published METEOR algorithm (exact -> stem -> synonym stages, identical
alpha=0.9/beta=3/gamma=0.5 defaults) and accepts a pluggable wordnet — we
inject a stub backed by the same synonym table METEOR-lite uses, so the
measured delta isolates ALIGNMENT + STEMMER differences (greedy one-to-one
+ suffix stemmer here vs nltk's staged matcher + Porter stemmer).

Measured on the fixture set below: delta = 0.0 on every pair (after
round 3 added the lemma-aware synonym module); asserted at mean<0.02 /
max<0.08 for headroom. The missing Java paraphrase-table stage is an
additional unquantifiable-offline gap, disclosed in
utils/caption_metrics.py.
"""

from __future__ import annotations

import pytest

from slam_llm_tpu.utils.caption_metrics import _tokenize, meteor_lite
from slam_llm_tpu.utils.spice import _SYN_ID, _SYNONYM_CLASSES


class _Lemma:
    def __init__(self, name):
        self._n = name

    def name(self):
        return self._n


class _Synset:
    def __init__(self, words):
        self._l = [_Lemma(w) for w in words]

    def lemmas(self):
        return self._l


class _WordnetStub:
    """Duck-typed nltk wordnet: synsets(word) from the in-tree table.

    nltk's stem stage rewrites its leftover words to Porter stems before the
    synonym stage (``_enum_stem_match``), so the stub also indexes each
    class member by its stem AND answers with stemmed lemma names — this is
    what makes nltk behave like the Java scorer, which runs each module on
    the original surface forms."""

    def __init__(self):
        from nltk.stem import PorterStemmer

        self._stem = PorterStemmer().stem
        self._by_form = {}
        for i, cls in enumerate(_SYNONYM_CLASSES):
            for w in cls:
                self._by_form.setdefault(w, i)
                self._by_form.setdefault(self._stem(w), i)

    def synsets(self, word):
        i = self._by_form.get(word)
        if i is None:
            return []
        members = sorted(
            set(_SYNONYM_CLASSES[i]) | {self._stem(w) for w in _SYNONYM_CLASSES[i]}
        )
        return [_Synset(members)]


FIXTURES = [
    # (candidate, reference) — AAC-style captions spanning exact matches,
    # stems, synonyms, reordering, and length mismatch
    ("a dog barking loudly", "a dog barks loudly"),
    ("a man is speaking", "a guy talks"),
    ("water dripping into a sink", "water drips in a sink slowly"),
    ("a car engine idles", "an automobile motor is idling"),
    ("birds chirping in the distance", "distant birds chirp"),
    ("a crowd cheering and clapping", "people clap and cheer"),
    ("rain falling on a roof", "rain falls onto the roof of a house"),
    ("a phone rings twice", "the telephone is ringing"),
    ("loud music playing", "music plays loudly in the background"),
    ("a door slams shut", "someone slams a door"),
    ("identical caption here", "identical caption here"),
    ("completely unrelated words", "nothing matches at all"),
]


def test_meteor_lite_delta_vs_nltk():
    from nltk.translate.meteor_score import single_meteor_score

    wn = _WordnetStub()
    deltas = []
    for cand, ref in FIXTURES:
        ours = meteor_lite([cand], [[ref]])
        theirs = single_meteor_score(_tokenize(ref), _tokenize(cand), wordnet=wn)
        deltas.append(abs(ours - theirs))
    mean = sum(deltas) / len(deltas)
    assert mean < 0.02, (mean, deltas)
    assert max(deltas) < 0.08, deltas


def test_meteor_lite_perfect_and_zero():
    # identical 2-token caption: fmean=1, frag=1 chunk/2 matches ->
    # penalty 1 - 0.5*(0.5)^3 = 0.9375 (the published formula's own value)
    assert meteor_lite(["identical caption"], [["identical caption"]]) == pytest.approx(0.9375)
    assert meteor_lite(["xyz"], [["abc def"]]) == 0.0
