"""In-tree SPICE (utils/spice.py): scene-graph extraction + tuple F1.

Fixture expectations are hand-derived from the Anderson et al. 2016 tuple
definition: T(G) = objects + (obj, attr) + (subj, rel, obj), candidate
matched against the UNION of reference tuples, mean per-caption F1.
"""

from __future__ import annotations

import pytest

from slam_llm_tpu.utils.spice import lemma, pos_tag, scene_graph, spice, tokenize


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def test_lemma():
    assert lemma("dogs") == "dog"
    assert lemma("barking") == "bark"
    assert lemma("running") == "run"
    assert lemma("driving") == "drive"
    assert lemma("children") == "child"
    assert lemma("buses") == "bus"
    assert lemma("cries") == "cry"
    assert lemma("spoke") == "speak"
    assert lemma("hissing") == "hiss"


def test_pos_tag_basics():
    toks = tokenize("a dog is barking loudly")
    tags = pos_tag(toks)
    assert tags == ["DT", "NN", "BE", "VB", "RB"]
    toks = tokenize("the barking dog")
    assert pos_tag(toks) == ["DT", "JJ", "NN"]


# ---------------------------------------------------------------------------
# scene graphs
# ---------------------------------------------------------------------------


def test_scene_graph_object_and_attribute():
    g = scene_graph("a loud engine")
    assert ("engine",) in g
    assert ("engine", "loud") in g


def test_scene_graph_intransitive_verb_is_attribute():
    g = scene_graph("a dog is barking")
    assert ("dog",) in g
    assert ("dog", "bark") in g


def test_scene_graph_relation():
    g = scene_graph("a man plays a guitar")
    assert ("man",) in g and ("guitar",) in g
    assert ("man", "play", "guitar") in g
    # the verb is also propositional on its own
    assert ("man", "play") in g


def test_scene_graph_prepositional_relation():
    g = scene_graph("a man in a car")
    assert ("man", "in", "car") in g


def test_scene_graph_verb_plus_preposition():
    g = scene_graph("water pouring into a sink")
    assert ("water", "pour into", "sink") in g


def test_scene_graph_coordination():
    g = scene_graph("dogs and cats")
    assert ("dog",) in g and ("cat",) in g


def test_scene_graph_copular_adjective():
    g = scene_graph("the music is loud")
    assert ("music", "loud") in g


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------


def test_spice_identical_is_one():
    caps = ["a man plays a loud guitar"]
    assert spice(caps, [caps]) == pytest.approx(1.0)


def test_spice_disjoint_is_zero():
    assert spice(["a dog barking"], [["water dripping in a sink"]]) == pytest.approx(0.0)


def test_spice_hand_computed_f1():
    # candidate: "a dog barking"    -> {(dog,), (dog, bark)}
    # reference: "a loud dog barks" -> {(dog,), (dog, loud), (dog, bark)}
    # P = 2/2, R = 2/3, F1 = 2*(1)*(2/3)/(1+2/3) = 0.8
    got = spice(["a dog barking"], [["a loud dog barks"]])
    assert got == pytest.approx(0.8)


def test_spice_synonym_match():
    # man/guy share a synonym class; speak/talk likewise
    got = spice(["a man speaking"], [["a guy talking"]])
    assert got == pytest.approx(1.0)


def test_spice_union_of_references():
    # tuples only need to appear in ANY reference for recall's union
    cand = ["a loud dog barking"]
    refs = [["a loud dog", "a dog barks"]]
    # cand: {(dog,), (dog, loud), (dog, bark)}; union refs: same set -> F1=1
    assert spice(cand, refs) == pytest.approx(1.0)


def test_spice_in_metric_bundle():
    from slam_llm_tpu.utils.caption_metrics import compute_caption_metrics

    out = compute_caption_metrics(
        ["a dog barking"], [["a dog barking", "a loud dog barks"]]
    )
    assert "spice" in out and "spider" in out
    assert out["spider"] == pytest.approx((out["cider"] + out["spice"]) / 2, abs=1e-3)
    assert "spider_cider_only" not in out


def test_meteor_synonym_stage():
    from slam_llm_tpu.utils.caption_metrics import meteor_lite

    with_syn = meteor_lite(["a man speaking"], [["a guy talking"]])
    assert with_syn > 0.5  # full alignment through the synonym table
