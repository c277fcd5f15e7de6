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


def main(argv=None):
    """CLI: score a decode log's fluency under a REAL pretrained LM.

    Requires --llm (HF dir, converted via utils/hf_loader) — scoring under
    random init would print plausible-looking noise.
    """
    import argparse

    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="decode log (key<TAB>text per line)")
    ap.add_argument("--llm", required=True, help="HF llama-family checkpoint dir")
    ap.add_argument("--llm-name", default="tinyllama-1.1b",
                    help="LLMConfig preset matching the checkpoint")
    args = ap.parse_args(argv)

    from slam_llm_tpu.data.tokenizer import load_tokenizer
    from slam_llm_tpu.models.llm import CausalLM, LLMConfig
    from slam_llm_tpu.utils.hf_loader import convert_llama, load_hf_state_dict

    presets = {
        "tinyllama-1.1b": LLMConfig.tinyllama_1_1b,
        "vicuna-7b": LLMConfig.vicuna_7b,
        "qwen2-7b": LLMConfig.qwen2_7b,
        "tiny-test": LLMConfig.tiny_test,
    }
    cfg = presets[args.llm_name]()
    tok = load_tokenizer(args.llm)

    texts = []
    with open(args.path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("\t", 1)
            if len(parts) == 2:
                texts.append(parts[1])

    model = CausalLM(cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones((1, 4), jnp.int32),
                        method="init_all")
    sub = convert_llama(load_hf_state_dict(args.llm), cfg)
    import numpy as _np

    host = jax.tree_util.tree_map(_np.asarray, params["params"])
    from slam_llm_tpu.utils.hf_loader import _overlay

    _overlay(host, sub)
    params = {"params": jax.tree_util.tree_map(jnp.asarray, host)}

    per_text, total = ppl_of_texts(model, params, tok, texts)
    print(json.dumps({"corpus_ppl": round(total, 3), "n": len(texts)}))
    return total


if __name__ == "__main__":
    main()
