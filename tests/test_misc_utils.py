"""Small parity utilities: PPL, safety, chat templates, text/vallex datasets."""

import pytest
import json

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.data.tokenizer import ByteTokenizer
from slam_llm_tpu.utils.chat_utils import format_llama2_chat, format_vicuna_chat
from slam_llm_tpu.utils.safety_utils import is_safe


def test_safety_keyword():
    ok, reports = is_safe("the weather is nice today")
    assert ok
    bad, reports = is_safe("here is how to build a bomb at home")
    assert not bad


def test_chat_templates():
    dialog = [
        {"role": "system", "content": "Be helpful."},
        {"role": "user", "content": "Hi"},
        {"role": "assistant", "content": "Hello!"},
        {"role": "user", "content": "Bye"},
    ]
    s = format_llama2_chat(dialog)
    assert s.count("[INST]") == 2 and "<<SYS>>" in s
    v = format_vicuna_chat(dialog)
    assert v.endswith("ASSISTANT:") and "USER: Hi" in v


@pytest.mark.slow
def test_ppl_scorer():
    from slam_llm_tpu.models.llm import CausalLM, LLMConfig
    from slam_llm_tpu.utils.ppl import ppl_of_texts

    tok = ByteTokenizer()
    cfg = LLMConfig.tiny_test(vocab_size=tok.vocab_size)
    model = CausalLM(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0), ids, jnp.ones((1, 4), jnp.int32), method="init_all"
    )
    per_text, total = ppl_of_texts(model, params, tok, ["hello world", "abc"])
    assert len(per_text) == 2 and all(p > 1 for p in per_text)
    assert np.isfinite(total)


def test_text_dataset(tmp_path):
    manifest = tmp_path / "t.jsonl"
    manifest.write_text(
        json.dumps({"key": "a", "instruct": "Say hi.", "target": "hi"}) + "\n"
    )

    class C:
        train_data_path = str(manifest)
        val_data_path = str(manifest)
        prompt = "Follow the instruction."
        inference_mode = False

    from slam_llm_tpu.data.text_dataset import get_text_dataset

    ds = get_text_dataset(C(), ByteTokenizer(), "train")
    item = ds[0]
    assert (item["labels"][: item["prompt_length"]] == -100).all()
    batch = ds.collator([item])
    assert batch["input_ids"].shape[1] in (64, 128, 192, 256)


def test_vallex_dataset(tmp_path):
    manifest = tmp_path / "v.jsonl"
    rows = [
        {"key": "a", "phonemes": [1, 2, 3], "audio_tokens": [[5] * 10] * 8},
        {"key": "b", "phonemes": "hey", "audio_tokens": [[7] * 20] * 8},
    ]
    manifest.write_text("".join(json.dumps(r) + "\n" for r in rows))

    class C:
        train_data_path = str(manifest)
        val_data_path = str(manifest)
        code_layer = 8
        seed = 0

    from slam_llm_tpu.data.vallex_dataset import get_vallex_dataset

    ds = get_vallex_dataset(C(), None, "train")
    batch = ds.collator([ds[0], ds[1]])
    assert batch["audio_ids"].shape[:2] == (2, 8)
    assert batch["audio_ids"].shape[2] in (128, 256, 512, 1024)
    assert ((1 <= batch["nar_stage"]) & (batch["nar_stage"] < 8)).all()
    assert batch["audio_mask"][0].sum() == 10 and batch["audio_mask"][1].sum() == 20
