"""Perplexity scoring of decode outputs (reference utils/compute_ppl.py).

Scores text files (key<TAB>text) under any of our CausalLM checkpoints —
the reference loads an HF GPT-2-style model; here the model comes from the
same factory/config surface as everything else."""

from __future__ import annotations

import json
import math
import sys
from typing import List

import numpy as np


def ppl_of_texts(model, params, tokenizer, texts: List[str], max_len: int = 512):
    """Mean per-token NLL -> perplexity for each text, plus corpus PPL."""
    import jax
    import jax.numpy as jnp

    nlls, counts = [], []
    for text in texts:
        ids = tokenizer.encode(text)[:max_len]
        if len(ids) < 2:
            nlls.append(0.0)
            counts.append(0)
            continue
        arr = jnp.asarray(np.asarray(ids, np.int32)[None])
        mask = jnp.ones_like(arr)
        embeds = model.apply(params, arr, method="embed")
        logits = model.apply(params, embeds, mask)
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = arr[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        nlls.append(float(nll.sum()))
        counts.append(int(tgt.size))
    per_text = [math.exp(n / c) if c else float("nan") for n, c in zip(nlls, counts)]
    total = math.exp(sum(nlls) / max(sum(counts), 1))
    return per_text, total


def main(path: str):
    from slam_llm_tpu.data.tokenizer import ByteTokenizer
    from slam_llm_tpu.models.llm import CausalLM, LLMConfig

    import jax

    texts = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("\t", 1)
            if len(parts) == 2:
                texts.append(parts[1])
    tok = ByteTokenizer()
    cfg = LLMConfig.tiny_test(vocab_size=tok.vocab_size)
    model = CausalLM(cfg)
    ids = jax.numpy.zeros((1, 4), jax.numpy.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jax.numpy.ones((1, 4), jax.numpy.int32), method="init_all")
    per_text, total = ppl_of_texts(model, params, tok, texts)
    print(json.dumps({"corpus_ppl": round(total, 3), "n": len(texts)}))


if __name__ == "__main__":
    main(sys.argv[1])
