"""S2S (SLAM-Omni) multi-stream dataset.

Mirrors reference ``examples/s2s/speech_dataset_s2s.py`` (jsonl manifest mode):
each item carries ``source_wav`` (question speech), ``source_text``,
``target_text`` and ``target_token`` (codec tokens: flat list for grouped
CosyVoice or code_layer lists for SNAC). Streams (code_layer audio + 1 text):

  prompt  : text=[input_t, tok(prompt), eot]       audio_i=[pad_a]*len
  input   : text=[input_t, pad_t*A, eot, answer_t] audio_i=[input_a, pad_a*A, eoa, answer_a]
  answer  : text=[tok(answer), eot, pad_t...]      audio_i=[target_tokens_i, pad_a...]

with labels = answer region only (prompt+input+3 masked to -100, and the
cross-padding between text/audio answer lengths masked per stream,
reference :333-357). All audio-stream ids are layershifted into the extended
vocab. One deliberate fix vs the reference: the modality (encoder splice)
span starts after the prompt + input_a marker — the reference starts it at
the left-padding boundary (speech_dataset_s2s.py:487), overlapping the
prompt; both are self-consistent, ours is semantically aligned.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np

from slam_llm_tpu.data.speech_dataset import bucketize
from slam_llm_tpu.models.s2s import VocabConfig
from slam_llm_tpu.ops import audio as audio_ops

IGNORE_INDEX = -100
# reference speech_dataset_s2s.py:28 (the inference drivers use the same
# "<SYSTEM>: " framing, so train and inference prompts stay in-distribution)
PROMPT_TEMPLATE = "<SYSTEM>: {}\n "
DEFAULT_S2S_PROMPT = (
    "Conduct a spoken conversation with the user. "
)


def group_answer_tokens(flat_tokens: List[int], code_layer: int, num_latency: int,
                        pad_a: int, eoa: int) -> np.ndarray:
    """Grouped (CosyVoice) codec stream -> (code_layer, T) with latency pads
    and EOA termination (reference utils/codec_utils get_group_answer_token)."""
    arr = np.asarray(flat_tokens, np.int64)
    n = (len(arr) // code_layer) * code_layer
    grouped = arr[:n].reshape(-1, code_layer).T  # (L, T)
    t = grouped.shape[1]
    out = np.full((code_layer, num_latency + t + 1), pad_a, np.int64)
    out[:, num_latency : num_latency + t] = grouped
    out[:, num_latency + t] = eoa
    return out


def snac_answer_tokens(layer_tokens: List[List[int]], pad_a: int, eoa: int) -> np.ndarray:
    """Per-layer SNAC token lists -> (code_layer, T) right-padded + EOA."""
    L = len(layer_tokens)
    t = max(len(x) for x in layer_tokens)
    out = np.full((L, t + 1), pad_a, np.int64)
    for i, toks in enumerate(layer_tokens):
        out[i, : len(toks)] = toks
        out[i, len(toks)] = eoa
    return out


class S2SDatasetJsonl:
    def __init__(self, dataset_config, tokenizer=None, split: str = "train"):
        from slam_llm_tpu.data.speech_dataset import normalize_split

        split = normalize_split(dataset_config, split)
        self.config = dataset_config
        self.tokenizer = tokenizer
        self.split = split
        vc = getattr(dataset_config, "vocab_config", None)
        if isinstance(vc, VocabConfig):
            self.vocab = vc
        else:
            text_v = getattr(dataset_config, "text_vocabsize", -1)
            if text_v is None or text_v < 0:
                text_v = getattr(tokenizer, "vocab_size", VocabConfig.text_vocabsize)
            self.vocab = VocabConfig(
                text_vocabsize=int(text_v),
                code_layer=getattr(dataset_config, "code_layer", 7),
                audio_vocabsize=getattr(dataset_config, "audio_vocabsize", 4096),
            )
        self.code_layer = self.vocab.code_layer
        self.task_type = getattr(dataset_config, "task_type", "s2s")
        self.prompt = getattr(dataset_config, "prompt", None) or DEFAULT_S2S_PROMPT
        self.mel_size = getattr(dataset_config, "mel_size", 80)
        self.fix_length_audio = getattr(dataset_config, "fix_length_audio", -1)
        self.inference_mode = getattr(dataset_config, "inference_mode", False)
        self.num_latency_tokens = getattr(dataset_config, "num_latency_tokens", 0)
        self.max_audio_samples = int(
            getattr(dataset_config, "max_audio_length_s", 30.0) * audio_ops.SAMPLE_RATE
        )

        path = (
            dataset_config.train_data_path if split == "train" else dataset_config.val_data_path
        )
        self.data_list = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    self.data_list.append(json.loads(line))

    def __len__(self):
        return len(self.data_list)

    def _shift(self, tok, layer):
        return self.vocab.layershift(np.asarray(tok, np.int64), layer)

    def _mel(self, wav_path: str):
        audio_raw = audio_ops.load_audio(wav_path)
        audio_raw = audio_ops.pad_or_trim(audio_raw, self.max_audio_samples)
        mel = audio_ops.log_mel_spectrogram(audio_raw, n_mels=self.mel_size)
        audio_length = (mel.shape[0] + 1) // 2 // 5
        if self.fix_length_audio > 0:
            audio_length = self.fix_length_audio
        return mel, audio_length

    def __getitem__(self, index: int) -> Dict[str, Any]:
        v = self.vocab
        L = self.code_layer
        item = self.data_list[index]
        source_wav = item.get("source_wav")
        target_token = item.get("target_token")
        source_text = item.get("source_text")
        target_text = item.get("target_text")
        key = item.get("key", str(index))

        audio_mel, audio_length = (None, 0)
        if self.task_type in ("s2s", "asr") and source_wav is not None:
            audio_mel, audio_length = self._mel(source_wav)

        target_audio = None
        target_audio_length = 0
        if target_token is not None and self.task_type == "s2s":
            if isinstance(target_token[0], list):
                target_audio = snac_answer_tokens(target_token, v.pad_a, v.eoa)
            else:
                target_audio = group_answer_tokens(
                    target_token, L, self.num_latency_tokens, v.pad_a, v.eoa
                )
            target_audio_length = target_audio.shape[1]

        # --- prompt region ---
        prompt = PROMPT_TEMPLATE.format(self.prompt)
        if source_text and "<USER>:" in source_text and self.task_type == "s2s":
            history = source_text.rsplit("<USER>:", 1)[0].strip()
            if history:
                prompt = prompt + history + "\n "
        prompt_ids = [v.input_t] + list(self.tokenizer.encode(prompt, add_bos=False)) + [v.eot]
        p_len = len(prompt_ids)
        streams = []
        for i in range(L):
            streams.append(list(self._shift(np.full(p_len, v.pad_a), i)))
        streams.append(list(prompt_ids))

        # --- input region: [marker, placeholders*A, eos, answer-marker] ---
        a_len = audio_length
        for i in range(L):
            streams[i] += (
                [int(self._shift(v.input_a, i))]
                + list(self._shift(np.full(a_len, v.pad_a), i))
                + [int(self._shift(v.eoa, i)), int(self._shift(v.answer_a, i))]
            )
        streams[L] += [v.input_t] + [v.pad_t] * a_len + [v.eot, v.answer_t]
        header = p_len + a_len + 3
        modality_start = p_len + 1  # first pad_a placeholder

        if self.task_type == "asr":
            target_text = (source_text or "").split("<USER>:")[-1].strip()

        if self.inference_mode:
            input_ids = np.stack([np.asarray(s, np.int64) for s in streams])
            return {
                "input_ids": input_ids,
                "attention_mask": np.ones(input_ids.shape[1], np.int32),
                "audio_mel": audio_mel,
                "audio_length": audio_length,
                "prompt_length": p_len,
                "header_length": header,
                "modality_start": modality_start,
                "key": key,
                "source_text": source_text,
                "target_text": target_text,
            }

        # --- answer region ---
        answer_text_ids = list(self.tokenizer.encode(str(target_text), add_bos=False)) + [v.eot]
        answer_len = max(len(answer_text_ids), target_audio_length)

        labels = [None] * (L + 1)
        for i in range(L):
            audio_lab = np.full(answer_len, IGNORE_INDEX, np.int64)
            audio_in = np.full(answer_len, int(self._shift(v.pad_a, i)), np.int64)
            if target_audio is not None:
                audio_lab[:target_audio_length] = target_audio[i]
                audio_in[:target_audio_length] = self._shift(target_audio[i], i)
            streams[i] += list(audio_in)
            labels[i] = audio_lab
        text_lab = np.full(answer_len, IGNORE_INDEX, np.int64)
        text_lab[: len(answer_text_ids)] = answer_text_ids
        text_in = np.full(answer_len, v.pad_t, np.int64)
        text_in[: len(answer_text_ids)] = answer_text_ids
        streams[L] += list(text_in)
        labels[L] = text_lab

        input_ids = np.stack([np.asarray(s, np.int64) for s in streams])  # (L+1, T)
        t_total = input_ids.shape[1]
        labels_full = np.full((L + 1, t_total), IGNORE_INDEX, np.int64)
        labels_full[:, header:] = np.stack(labels)
        if self.task_type == "asr":
            labels_full[:L, :] = IGNORE_INDEX

        return {
            "input_ids": input_ids,
            "labels": labels_full,
            "attention_mask": np.ones(t_total, np.int32),
            "audio_mel": audio_mel,
            "audio_length": audio_length,
            "prompt_length": p_len,
            "header_length": header,
            "modality_start": modality_start,
            "key": key,
            "source_text": source_text,
            "target_text": target_text,
        }

    def sort_key(self, index: int) -> int:
        item = self.data_list[index]
        tok = item.get("target_token") or []
        if tok and isinstance(tok[0], (list, tuple)):
            # SNAC manifests: list of code_layer per-layer streams — the
            # batching length proxy is the STREAM length, not the constant
            # number of layers
            tok_len = max(len(t) for t in tok)
        else:
            tok_len = len(tok)
        return len(str(item.get("target_text", ""))) + tok_len

    # ---- collation ---------------------------------------------------------

    def collator(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        v = self.vocab
        L = self.code_layer
        text_buckets = list(getattr(self.config, "text_buckets", [128, 256, 512, 1024]))

        headers = [s["header_length"] for s in samples]
        answers = [s["input_ids"].shape[1] - h for s, h in zip(samples, headers)]
        max_header = max(headers)
        total = bucketize(max_header + max(answers) if answers else max_header, text_buckets)

        b = len(samples)
        t_pad_id = v.pad_t
        input_ids = np.zeros((b, L + 1, total), np.int64)
        for i in range(L):
            input_ids[:, i, :] = int(v.layershift(v.pad_a, i))
        input_ids[:, L, :] = t_pad_id
        attention_mask = np.zeros((b, total), np.int32)
        labels = np.full((b, L + 1, total), IGNORE_INDEX, np.int64)
        modality_mask = np.zeros((b, total), np.int32)

        for bi, s in enumerate(samples):
            left = max_header - headers[bi]
            n = s["input_ids"].shape[1]
            input_ids[bi, :, left : left + n] = s["input_ids"]
            attention_mask[bi, left : left + n] = 1
            if "labels" in s:
                labels[bi, :, left : left + n] = s["labels"]
            ms = left + s["modality_start"]
            modality_mask[bi, ms : ms + s["audio_length"]] = 1

        out = {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "modality_mask": modality_mask,
        }
        if not self.inference_mode:
            out["labels"] = labels

        mels = [s["audio_mel"] for s in samples if s["audio_mel"] is not None]
        if mels:
            mel_len = max(m.shape[0] for m in mels)
            n_mels = mels[0].shape[1]
            audio_mel = np.zeros((b, mel_len, n_mels), np.float32)
            audio_mel_mask = np.zeros((b, mel_len), np.int32)
            for bi, s in enumerate(samples):
                if s["audio_mel"] is not None:
                    m = s["audio_mel"]
                    audio_mel[bi, : m.shape[0]] = m
                    audio_mel_mask[bi, : m.shape[0]] = 1
            out["audio_mel"] = audio_mel
            out["audio_mel_mask"] = audio_mel_mask

        if self.inference_mode:
            out["keys"] = [s["key"] for s in samples]
            out["targets"] = [s["target_text"] for s in samples]
        return out


def get_s2s_dataset(dataset_config, tokenizer, split: str) -> S2SDatasetJsonl:
    return S2SDatasetJsonl(dataset_config, tokenizer, split)
