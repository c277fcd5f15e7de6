"""BERT tower parity vs transformers.BertModel (tiny random config)."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import numpy as np
import torch

from slam_llm_tpu.models.bert import BertConfig, BertEncoder, convert_bert_torch_state


def test_bert_parity_vs_hf():
    from transformers import BertConfig as HFBertConfig, BertModel

    cfg = BertConfig.tiny_test()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.d_model,
        num_hidden_layers=cfg.n_layers, num_attention_heads=cfg.n_heads,
        intermediate_size=cfg.ffn_dim, max_position_embeddings=cfg.max_positions,
        type_vocab_size=cfg.type_vocab_size, layer_norm_eps=cfg.ln_eps,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()
    params = convert_bert_torch_state(hf.state_dict(), cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, cfg.vocab_size, (2, 11)).astype(np.int64)
    mask = np.ones((2, 11), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        want = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state.numpy()

    model = BertEncoder(cfg)
    got = np.asarray(model.apply(params, ids, mask))
    # compare only unmasked positions (HF computes masked ones too but they
    # attend nothing meaningful either way)
    sel = mask.astype(bool)
    np.testing.assert_allclose(got[sel], want[sel], atol=2e-4, rtol=1e-3)
