"""FENSE (utils/fense.py): WordPiece tokenizer parity, SBERT embedding
parity vs HF BertModel, and the fluency-penalty scoring path — all on tiny
local fixtures (the real scorer loads published checkpoints the same way)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest
import torch

from slam_llm_tpu.utils.fense import FenseScorer, WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the dog cat man guy loud quiet bark "
    "##ing ##s speak talk water drip sound of in on and is are".split()
)


@pytest.fixture(scope="module")
def sbert_dir(tmp_path_factory):
    """Tiny HF BertModel dir + vocab.txt, saved like a real SBERT ckpt."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    d = tmp_path_factory.mktemp("sbert")
    (d / "vocab.txt").write_text("\n".join(VOCAB) + "\n")
    cfg = HFBertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=64,
        type_vocab_size=2,
    )
    torch.manual_seed(0)
    model = BertModel(cfg).eval()
    model.save_pretrained(d)
    return d, model


def test_wordpiece_matches_hf_tokenizer(sbert_dir):
    from transformers import BertTokenizer

    d, _ = sbert_dir
    ours = WordPieceTokenizer(str(d / "vocab.txt"))
    hf = BertTokenizer(str(d / "vocab.txt"), do_lower_case=True)
    for text in (
        "a dog barking", "The loud DOG barks", "a man speaking, and water dripping",
        "zzzunknownzzz word", "cats talking",
    ):
        got = ours.encode(text, max_len=32)
        want = hf.encode(text, truncation=True, max_length=32)
        assert got == want, (text, got, want)


def test_embed_matches_hf_mean_pooling(sbert_dir):
    d, hf_model = sbert_dir
    scorer = FenseScorer(str(d))
    texts = ["a dog barking", "a man speaking and a cat"]
    z = scorer.embed(texts)
    assert z.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(z, axis=-1), 1.0, rtol=1e-5)

    # HF reference: same tokenization, masked mean pooling, L2 norm
    ids, mask = scorer.tokenizer.batch(texts, 64)
    with torch.no_grad():
        h = hf_model(
            torch.from_numpy(ids.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float32)
    ref = (h * m).sum(1) / m.sum(1)
    ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
    np.testing.assert_allclose(z, ref, atol=2e-4)


def test_fense_similarity_ranking(sbert_dir):
    d, _ = sbert_dir
    scorer = FenseScorer(str(d))
    same = scorer.score(["a dog barking"], [["a dog barking"]])
    diff = scorer.score(["a dog barking"], [["water dripping in the sound"]])
    assert same == pytest.approx(1.0, abs=1e-4)
    assert diff < same


def test_echecker_penalty(sbert_dir, tmp_path):
    """Fabricate an echecker ckpt (tiny BERT + 6-way head) whose bias forces
    every probability ~1: all candidates get flagged and penalized x(1-0.9)."""
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    d, _ = sbert_dir
    torch.manual_seed(1)
    cfg = HFBertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=64,
        type_vocab_size=2,
    )
    bert = BertModel(cfg).eval()
    sd = {f"encoder.{k}": v for k, v in bert.state_dict().items()}
    sd["clf.weight"] = torch.zeros(6, 32)
    sd["clf.bias"] = torch.full((6,), 10.0)  # sigmoid(10) ~ 1 -> always flagged
    ck = tmp_path / "echecker.ckpt"
    torch.save({"model_state_dict": sd}, ck)

    plain = FenseScorer(str(d))
    checked = FenseScorer(str(d), echecker_path=str(ck))
    assert checked.fluency_errors(["a dog barking"]) == [True]
    s_plain = plain.score(["a dog barking"], [["a dog barking"]])
    s_checked = checked.score(["a dog barking"], [["a dog barking"]])
    assert s_checked == pytest.approx(s_plain * 0.1, rel=1e-3)
