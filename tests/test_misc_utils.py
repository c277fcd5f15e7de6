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


def test_drcap_projection_and_retrieval(tmp_path):
    """DRCap projection decoding + RAG retrieval + manifest augmentation."""
    from slam_llm_tpu.utils.drcap import (
        augment_manifest_with_rag,
        load_support,
        projection_decode,
        retrieve_topk,
        save_support,
    )

    rng = np.random.default_rng(0)
    captions = [f"caption {i}" for i in range(6)]
    support = rng.standard_normal((6, 4)).astype(np.float32)
    support /= np.linalg.norm(support, axis=1, keepdims=True)

    # projection decode: a latent equal to a support row w/ tiny temp -> ~row
    z = support[2:3]
    proj = projection_decode(z, support, temp=0.01)
    np.testing.assert_allclose(proj[0], support[2], atol=1e-3)
    # high temp -> close to the support mean
    proj_hi = projection_decode(z, support, temp=1e6)
    np.testing.assert_allclose(proj_hi[0], support.mean(0), atol=1e-4)

    top = retrieve_topk(z, support, captions, k=2, exclude_self=True)
    assert len(top[0]) == 2 and "caption 2" not in top[0]

    # manifest augmentation with a fake embed_fn
    m_in = tmp_path / "in.jsonl"
    m_in.write_text(
        json.dumps({"key": "a", "target": "caption 0"}) + "\n"
        + json.dumps({"key": "b", "target": "caption 3"}) + "\n"
    )
    lut = {c: support[i] for i, c in enumerate(captions)}
    n = augment_manifest_with_rag(
        str(m_in), str(tmp_path / "out.jsonl"), captions, support,
        embed_fn=lambda ts: np.stack([lut[t] for t in ts]), k=2,
    )
    assert n == 2
    rows = [json.loads(l) for l in open(tmp_path / "out.jsonl")]
    assert all(len(r["similar_captions"]) == 2 for r in rows)
    assert "caption 0" not in rows[0]["similar_captions"]  # self excluded

    save_support(str(tmp_path / "sup.npz"), captions, support)
    caps2, emb2 = load_support(str(tmp_path / "sup.npz"))
    assert caps2 == captions
    np.testing.assert_allclose(emb2, support)


def test_similar_captions_prompt_injection(tmp_path):
    """DRCap RAG manifests fold retrieved captions into the prompt."""
    import wave

    from slam_llm_tpu.data.speech_dataset import SpeechDatasetJsonl
    from slam_llm_tpu.data.tokenizer import ByteTokenizer

    wav = tmp_path / "a.wav"
    pcm = (np.sin(np.linspace(0, 90, 3200)) * 20000).astype(np.int16)
    with wave.open(str(wav), "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
        f.writeframes(pcm.tobytes())
    manifest = tmp_path / "m.jsonl"
    manifest.write_text(
        json.dumps({"key": "u1", "source": str(wav), "target": "x",
                    "similar_captions": ["dogs bark loudly", "a dog barks"]}) + "\n"
    )

    class C:
        train_data_path = str(manifest)
        val_data_path = str(manifest)
        mel_size = 8

    ds = SpeechDatasetJsonl(C(), ByteTokenizer(), "train")
    item = ds[0]
    text = bytes(
        i for i in item["input_ids"][item["audio_length"]:] if 0 <= i < 256
    ).decode("utf-8", errors="ignore")
    assert "dogs bark loudly" in text and "a dog barks" in text


def test_number_to_words_roundtrip():
    """digits->words must invert textnorm's words->number parsing."""
    from slam_llm_tpu.utils.preprocess_text import number_to_words
    from slam_llm_tpu.utils.textnorm import normalize_numbers

    for n in [0, 7, 13, 20, 21, 45, 99, 100, 101, 123, 999, 1000, 1006,
              2024, 15000, 1000000, 2000003]:
        words = number_to_words(n)
        back = normalize_numbers(words)
        # multi-word numbers convert back to digits; single-word ones
        # ("seven") stay words by design — check digits where converted
        if any(ch.isdigit() for ch in back):
            assert back.strip() == str(n), (n, words, back)


def test_digits_to_words_tokens_only():
    from slam_llm_tpu.utils.preprocess_text import digits_to_words

    assert digits_to_words("i saw 2 cats") == "i saw two cats"
    assert digits_to_words("room 42nd floor 4.5") == "room 42nd floor 4.5"


def test_kaldi_uppercase(tmp_path):
    from slam_llm_tpu.utils.preprocess_text import preprocess_file

    src = tmp_path / "in.tsv"
    src.write_text("u1\t<|en|>Hello, world! it's 3 pm.\nu2\t\n")
    dst = tmp_path / "out.txt"
    preprocess_file(str(src), str(dst), num2word=True)
    lines = dst.read_text().splitlines()
    assert lines[0] == "u1 ENHELLO WORLD IT'S THREE PM"
    assert lines[1] == "u2  "
