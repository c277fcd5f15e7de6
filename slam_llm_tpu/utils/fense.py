"""FENSE (Zhou et al. 2022) — the slam_aac README's sixth metric column.

FENSE = max-over-references sentence-embedding cosine similarity, multiplied
by (1 - 0.9) when a trained fluency-error detector flags the candidate. The
published scorer is two torch models downloaded at run time:

  * an SBERT encoder (``paraphrase-TinyBERT-L6-v2``): BERT trunk + masked
    mean pooling + L2 normalization;
  * an "echecker" (``echecker_clotho_audiocaps_base``): BERT trunk + linear
    head emitting 6 sigmoid error probabilities (add-tail, repeat-event,
    repeat-adv, remove-conj, remove-verb, overall error); a candidate is
    disfluent when any probability > 0.9.

This module rebuilds both structures on the in-tree JAX BERT
(models/bert.py) with converters for the published checkpoints, plus a
self-contained WordPiece tokenizer that reads the checkpoint's own
``vocab.txt`` — nothing is downloaded, weights load from local paths at
run time like every other converter in this repo.

Usage:
    scorer = FenseScorer(sbert_path="/ckpts/paraphrase-TinyBERT-L6-v2",
                         echecker_path="/ckpts/echecker_base.ckpt")
    out = compute_caption_metrics(cands, refs,
                                  fense_embed_fn=scorer.embed,
                                  fense_fluency_fn=scorer.fluency_errors)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

# ---------------------------------------------------------------------------
# WordPiece tokenizer (BERT-uncased semantics, vocab.txt-driven)
# ---------------------------------------------------------------------------


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a BERT ``vocab.txt``.

    Matches ``transformers.BertTokenizer(do_lower_case=True)`` on standard
    vocabularies: basic whitespace+punctuation split, lowercasing, then
    per-word greedy subword match with the ``##`` continuation prefix and
    ``[UNK]`` for unmatchable words.
    """

    def __init__(self, vocab_file: str, do_lower_case: bool = True):
        self.vocab: Dict[str, int] = {}
        with open(vocab_file, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.do_lower_case = do_lower_case
        self.cls_id = self.vocab["[CLS]"]
        self.sep_id = self.vocab["[SEP]"]
        self.pad_id = self.vocab["[PAD]"]
        self.unk_id = self.vocab["[UNK]"]
        self.max_word_chars = 100

    @staticmethod
    def _is_punct(ch: str) -> bool:
        cp = ord(ch)
        if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
            return True
        import unicodedata

        return unicodedata.category(ch).startswith("P")

    def _basic_split(self, text: str) -> List[str]:
        if self.do_lower_case:
            text = text.lower()
        out: List[str] = []
        word: List[str] = []
        for ch in text:
            if ch.isspace():
                if word:
                    out.append("".join(word))
                    word = []
            elif self._is_punct(ch):
                if word:
                    out.append("".join(word))
                    word = []
                out.append(ch)
            else:
                word.append(ch)
        if word:
            out.append("".join(word))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        if len(word) > self.max_word_chars:
            return [self.unk_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(self, text: str, max_len: int = 64) -> List[int]:
        ids = [self.cls_id]
        for w in self._basic_split(text):
            ids.extend(self._wordpiece(w))
            if len(ids) >= max_len - 1:
                break
        return ids[: max_len - 1] + [self.sep_id]

    def batch(self, texts: Sequence[str], max_len: int = 64):
        rows = [self.encode(t, max_len) for t in texts]
        t = max(len(r) for r in rows)
        input_ids = np.full((len(rows), t), self.pad_id, np.int32)
        mask = np.zeros((len(rows), t), np.int32)
        for i, r in enumerate(rows):
            input_ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return input_ids, mask


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------


def _strip_prefix(sd: Dict[str, Any], marker: str = "embeddings.word_embeddings.weight") -> Dict[str, Any]:
    """Find the BERT subtree regardless of wrapper prefix (``bert.``,
    ``encoder.``, ``0.auto_model.``...)."""
    for k in sd:
        if k.endswith(marker):
            prefix = k[: -len(marker)]
            return {kk[len(prefix):]: v for kk, v in sd.items() if kk.startswith(prefix)}
    raise KeyError(f"no key ending with {marker!r} in checkpoint")


def _bert_cfg_from_state(sd: Dict[str, Any]):
    from slam_llm_tpu.models.bert import BertConfig

    word = np.asarray(sd["embeddings.word_embeddings.weight"])
    pos = np.asarray(sd["embeddings.position_embeddings.weight"])
    typ = np.asarray(sd["embeddings.token_type_embeddings.weight"])
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.layer.")
    )
    ffn = np.asarray(sd["encoder.layer.0.intermediate.dense.weight"]).shape[0]
    d = word.shape[1]
    # head count is not in the state dict; BERT uses d/64 heads universally
    return BertConfig(
        vocab_size=word.shape[0], d_model=d, n_layers=n_layers,
        n_heads=max(1, d // 64), ffn_dim=ffn, max_positions=pos.shape[0],
        type_vocab_size=typ.shape[0],
    )


class FenseScorer:
    """Runtime-weight FENSE: SBERT similarity + optional fluency penalty."""

    def __init__(
        self,
        sbert_path: str,
        echecker_path: Optional[str] = None,
        error_threshold: float = 0.9,
        penalty: float = 0.9,
        max_len: int = 64,
    ):
        import jax

        from slam_llm_tpu.models.bert import BertEncoder, convert_bert_torch_state
        from slam_llm_tpu.utils.hf_loader import load_hf_state_dict, load_torch_checkpoint

        self.error_threshold = error_threshold
        self.penalty = penalty
        self.max_len = max_len

        if os.path.isdir(sbert_path):
            sd = load_hf_state_dict(sbert_path)
            vocab_file = os.path.join(sbert_path, "vocab.txt")
        else:
            sd = load_torch_checkpoint(sbert_path)
            vocab_file = os.path.join(os.path.dirname(sbert_path), "vocab.txt")
        sd = _strip_prefix({k: np.asarray(v) for k, v in sd.items()})
        self.tokenizer = WordPieceTokenizer(vocab_file)
        import jax.numpy as jnp

        cfg = _bert_cfg_from_state(sd)
        self._sbert = BertEncoder(cfg)
        # jnp leaves: numpy params cannot be fancy-indexed by tracers under jit
        self._sbert_vars = jax.tree_util.tree_map(
            jnp.asarray, convert_bert_torch_state(sd, cfg)
        )
        self._sbert_fwd = jax.jit(
            lambda ids, mask: self._sbert.apply(self._sbert_vars, ids, mask)
        )

        self._echecker = None
        if echecker_path:
            raw = load_torch_checkpoint(echecker_path)
            if isinstance(raw, dict) and "model_state_dict" in raw:
                raw = raw["model_state_dict"]
            raw = {k: np.asarray(v) for k, v in raw.items()}
            head_w = next(
                raw[k] for k in raw if k.endswith("clf.weight") or k.endswith("classifier.weight")
            )
            head_b = next(
                raw[k] for k in raw if k.endswith("clf.bias") or k.endswith("classifier.bias")
            )
            esd = _strip_prefix(raw)
            ecfg = _bert_cfg_from_state(esd)
            enc = BertEncoder(ecfg)
            evars = jax.tree_util.tree_map(
                jnp.asarray, convert_bert_torch_state(esd, ecfg)
            )
            w = jnp.asarray(np.asarray(head_w, np.float32).T)  # (D, 6)
            b = jnp.asarray(head_b, np.float32)

            def echeck(ids, mask):
                h = enc.apply(evars, ids, mask)  # (B, T, D)
                logits = h[:, 0] @ w + b  # CLS head
                return jax.nn.sigmoid(logits)

            self._echecker = jax.jit(echeck)

    # -- public interface (pluggable into caption_metrics.fense) --

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        """Masked mean-pooled, L2-normalized sentence embeddings (B, D)."""
        ids, mask = self.tokenizer.batch(list(texts), self.max_len)
        h = np.asarray(self._sbert_fwd(ids, mask))
        m = mask[..., None].astype(np.float32)
        z = (h * m).sum(1) / np.maximum(m.sum(1), 1e-9)
        return z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-12)

    def fluency_errors(self, texts: Sequence[str]) -> List[bool]:
        """True where the echecker flags any error class above threshold.
        Without an echecker checkpoint, nothing is flagged (similarity-only
        FENSE, as the published scorer behaves with the penalty disabled)."""
        if self._echecker is None:
            return [False] * len(texts)
        ids, mask = self.tokenizer.batch(list(texts), self.max_len)
        probs = np.asarray(self._echecker(ids, mask))
        return list((probs > self.error_threshold).any(axis=-1))

    def score(self, candidates: List[str], references: List[List[str]]) -> float:
        from slam_llm_tpu.utils.caption_metrics import fense

        return fense(
            candidates, references, self.embed,
            fluency_error_fn=self.fluency_errors, penalty=self.penalty,
        )
