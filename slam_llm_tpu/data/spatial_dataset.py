"""Spatial SoundQA (BAT/SELD) dataset: anechoic sources spatialised with
binaural room impulse responses.

Mirrors reference examples/seld_spatialsoundqa/dataset/spatial_audio_dataset.py:
each QA item names an AudioSet clip (``audio_id``) and a binaural reverb IR
(``reverb_id``); the waveform is mono-ised, resampled to 32 kHz, loudness
normalised to -14 dBFS (:93-104), convolved with the 2-channel IR (:115-117),
optionally averaged with a second spatialised source (:120-137), and padded
to exactly 10 s. The collator stacks the stereo clips and computes the
4-channel binaural feature map (log-mel L/R + cos/sin IPD) on the host so
the TPU step stays FFT-free (``models/spatial_ast.binaural_features``).

QA manifests are the reference's ``{qa_data_root}/{stage}/{split}.json`` with
a ``{"data": [...]}`` list (:39-41); a plain jsonl via train/val_data_path is
also accepted for uniformity with the other recipes.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
from scipy import signal

from slam_llm_tpu.data.speech_dataset import IGNORE_INDEX, SpeechDatasetJsonl
from slam_llm_tpu.ops import audio as audio_ops

SPATIAL_SR = 32000
CLIP_SECONDS = 10

# BAT's Alpaca-style prompt (reference spatial_audio_dataset.py:14-29;
# the no-input variant is the only one the recipe uses)
PROMPT_NO_INPUT = (
    "Based on the audio you've heard, refer to the instruction and provide a "
    "response.\n\n### Instruction:\n{instruction}\n\n### Response:"
)


def format_prompt(instruction: str) -> str:
    return PROMPT_NO_INPUT.format(instruction=instruction)


def normalize_audio(x: np.ndarray, target_dbfs: float = -14.0) -> np.ndarray:
    """RMS loudness normalisation (reference :92-103); silent audio passes
    through untouched."""
    rms = float(np.sqrt(np.mean(np.square(x, dtype=np.float64))))
    if rms == 0.0:
        return x
    gain = 10.0 ** ((target_dbfs - 20.0 * np.log10(rms)) / 20.0)
    return (x * gain).astype(np.float32)


def _load_mono_32k(path: str) -> np.ndarray:
    # reference mono-ises with channel 0 and resample_poly's to 32 kHz
    return audio_ops.load_audio(path, sr=SPATIAL_SR)


def spatialize(
    wav: np.ndarray, reverb: Optional[np.ndarray], n_samples: int
) -> np.ndarray:
    """mono (T,) + IR (C, L) -> (C, n_samples) via full fftconvolve then
    right pad/trim (reference :110-118)."""
    x = wav.reshape(1, -1)
    if reverb is not None:
        x = signal.fftconvolve(x, np.asarray(reverb, np.float32), mode="full")
    pad = n_samples - x.shape[1]
    if pad >= 0:
        x = np.pad(x, ((0, 0), (0, pad)))
    else:
        x = x[:, :n_samples]
    return np.ascontiguousarray(x, dtype=np.float32)


class SpatialAudioDatasetJsonl(SpeechDatasetJsonl):
    """QA items over spatialised AudioSet clips; emits stereo waveforms that
    the collator turns into ``audio_binaural`` feature maps."""

    def __init__(self, dataset_config, tokenizer=None, split: str = "train"):
        from slam_llm_tpu.data.speech_dataset import normalize_split

        split = normalize_split(dataset_config, split)
        self.config = dataset_config
        self.tokenizer = tokenizer
        self.split = split
        self.inference_mode = getattr(dataset_config, "inference_mode", False)
        self.normalize = getattr(dataset_config, "normalize", True)
        self.fix_length_audio = getattr(dataset_config, "fix_length_audio", -1)
        if self.fix_length_audio <= 0:
            # q-former output length; reference scripts pass fix_length_audio=64
            self.fix_length_audio = 64

        self.anechoic_data_root = getattr(dataset_config, "anechoic_data_root", "") or ""
        self.reverb_data_root = getattr(dataset_config, "reverb_data_root", "") or ""
        self.channel_type = getattr(dataset_config, "channel_type", "binaural")
        self.ext_audio = getattr(dataset_config, "ext_audio", ".wav")
        self.n_samples = CLIP_SECONDS * SPATIAL_SR

        qa_root = getattr(dataset_config, "qa_data_root", None)
        if qa_root:
            stage = getattr(dataset_config, "stage", None) or ""
            # reference manifests are named train/val/eval/test.json; the
            # pipeline's split names differ ("validation") — resolve aliases
            aliases = {"validation": ("val", "eval", "test"),
                       "val": ("validation", "eval", "test"),
                       "test": ("eval", "val", "validation")}
            candidates = [split, *aliases.get(split, ())]
            paths = [os.path.join(qa_root, stage, c + ".json") for c in candidates]
            path = next((p for p in paths if os.path.exists(p)), paths[0])
            with open(path, encoding="utf-8") as fin:
                self.data_list: List[dict] = json.load(fin)["data"]
        else:
            path = (
                dataset_config.train_data_path
                if split == "train"
                else dataset_config.val_data_path
            )
            self.data_list = []
            with open(path, encoding="utf-8") as fin:
                for line in fin:
                    line = line.strip()
                    if line:
                        self.data_list.append(json.loads(line))

    # ---- audio -----------------------------------------------------------

    def _load_source(self, audio_id: str, reverb_id: Optional[str]) -> np.ndarray:
        wav = _load_mono_32k(os.path.join(self.anechoic_data_root, audio_id + self.ext_audio))
        if self.normalize:
            wav = normalize_audio(wav, -14.0)
        reverb = None
        if reverb_id:
            reverb = np.load(os.path.join(self.reverb_data_root, self.channel_type, reverb_id))
        return spatialize(wav, reverb, self.n_samples)

    def load_waveform(self, item: Dict[str, Any]) -> np.ndarray:
        """(2, 320000) stereo clip; two-source items are averaged after each
        is spatialised independently (reference :120-137)."""
        wav = self._load_source(item["audio_id"], item.get("reverb_id"))
        if item.get("audio_id2") is not None and item.get("reverb_id2") is not None:
            wav2 = self._load_source(item["audio_id2"], item["reverb_id2"])
            wav = (wav + wav2) / 2
        if wav.shape[0] == 1:  # mono channel_type: duplicate so the
            wav = np.repeat(wav, 2, axis=0)  # binaural frontend still works
        return wav

    # ---- items -----------------------------------------------------------

    def __getitem__(self, index: int) -> Dict[str, Any]:
        item = self.data_list[index]
        waveform = self.load_waveform(item)
        prompt = format_prompt(item["question"])
        answer = str(item["answer"])
        audio_length = self.fix_length_audio

        prompt_ids = self.tokenizer.encode(prompt)
        prompt_length = len(prompt_ids)
        audio_pseudo = np.full((audio_length,), -1, dtype=np.int64)

        if self.inference_mode:
            input_ids = np.concatenate([audio_pseudo, np.asarray(prompt_ids, np.int64)])
            # pseudo ids stay -1 in inference mode: the model clamps before
            # embedding, and generate's repetition penalty uses -1 to exclude
            # audio slots from prompt token counts (speech_dataset contract)
            return {
                "input_ids": input_ids,
                "attention_mask": np.ones_like(input_ids, dtype=np.int32),
                "audio_stereo": waveform,
                "audio_length": audio_length,
                "prompt_length": prompt_length,
                "key": f"{item.get('question_type', 'qa')}-{item.get('question_id', index)}",
                "target": answer,
            }

        example_ids = self.tokenizer.encode(prompt + answer)
        example_ids = list(example_ids) + [self.tokenizer.eos_token_id]
        example_ids = np.concatenate([audio_pseudo, np.asarray(example_ids, np.int64)])
        labels = example_ids.copy()
        labels[: audio_length + prompt_length] = IGNORE_INDEX
        input_ids = example_ids.copy()
        input_ids[input_ids == -1] = 0
        return {
            "input_ids": input_ids,
            "labels": labels,
            "attention_mask": np.ones_like(input_ids, dtype=np.int32),
            "audio_stereo": waveform,
            "audio_length": audio_length,
            "prompt_length": prompt_length,
            "key": f"{item.get('question_type', 'qa')}-{item.get('question_id', index)}",
            "target": answer,
        }

    # ---- collation -------------------------------------------------------

    def collator(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        from slam_llm_tpu.models.spatial_ast import binaural_features

        out = self.collate_text(samples)
        stereo = np.stack([s["audio_stereo"] for s in samples])  # (B, 2, T)
        out["audio_binaural"] = binaural_features(stereo)  # (B, 4, frames, 128)
        return out

    def sort_key(self, index: int) -> int:
        # every clip is exactly 10 s — answer length is the only variance
        return len(str(self.data_list[index].get("answer", "")))


def get_spatial_audio_dataset(dataset_config, tokenizer, split: str) -> SpatialAudioDatasetJsonl:
    return SpatialAudioDatasetJsonl(dataset_config, tokenizer, split)
