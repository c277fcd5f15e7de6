"""Music-captioning jsonl dataset (MusicFM mel input).

Mirrors reference ``datasets/mir_dataset.py``: music audio (24 kHz), random
fixed-length crop for training, MusicFM dB-mel features, caption targets;
audio_length = mel_T // 4 (conv 4x subsample) // projector ds_rate."""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from slam_llm_tpu.data.speech_dataset import (
    IGNORE_INDEX,
    PROMPT_TEMPLATE,
    SpeechDatasetJsonl,
)
from slam_llm_tpu.ops import audio as audio_ops

DEFAULT_MC_PROMPT = "Describe the music you hear. "
MUSIC_SR = 24000


class MIRDatasetJsonl(SpeechDatasetJsonl):
    def __init__(self, dataset_config, tokenizer=None, split: str = "train"):
        # bypass the parent's raw/mel assert WITHOUT mutating the shared
        # config object (other components read dataset_config.input_type)
        orig_input_type = getattr(dataset_config, "input_type", "mel")
        dataset_config.input_type = "mel"
        try:
            super().__init__(dataset_config, tokenizer, split)
        finally:
            dataset_config.input_type = orig_input_type
        self.crop_seconds = getattr(dataset_config, "crop_seconds", 10.0)
        self.ds_rate = getattr(dataset_config, "encoder_projector_ds_rate", 5)
        self.random_crop = split == "train"
        self._crop_rng = np.random.default_rng(
            getattr(dataset_config, "seed", 0) + 777
        )
        if getattr(dataset_config, "prompt", None) is None:
            self.prompt = DEFAULT_MC_PROMPT

    def __getitem__(self, index: int) -> Dict[str, Any]:
        item = self.data_list[index]
        target = item.get("target")
        key = item.get("key")
        audio_raw = audio_ops.load_audio(item.get("source"), sr=MUSIC_SR)
        crop = int(self.crop_seconds * MUSIC_SR)
        if len(audio_raw) > crop:
            if self.random_crop:
                # seeded per-instance generator under a lock: the global
                # legacy np.random is neither reproducible nor thread-safe
                # under the threaded prefetch loader
                with self._specaug_lock:
                    start = int(self._crop_rng.integers(0, len(audio_raw) - crop))
            else:
                start = 0
            audio_raw = audio_raw[start : start + crop]
        else:
            audio_raw = np.pad(audio_raw, (0, crop - len(audio_raw)))
        mel = audio_ops.music_log_mel(audio_raw, sr=MUSIC_SR)
        if self.specaug:
            from slam_llm_tpu.ops.specaug import spec_augment

            with self._specaug_lock:
                child = int(self._specaug_rng.integers(2**63))
            mel = spec_augment(mel, rng=np.random.default_rng(child))
        audio_length = (mel.shape[0] // 4) // self.ds_rate
        if self.fix_length_audio > 0:
            audio_length = self.fix_length_audio

        prompt_ids = self.tokenizer.encode(PROMPT_TEMPLATE.format(self.prompt))
        prompt_length = len(prompt_ids)
        audio_pseudo = np.full((audio_length,), -1, np.int64)

        if self.inference_mode:
            input_ids = np.concatenate([audio_pseudo, np.asarray(prompt_ids, np.int64)])
            # pseudo ids stay -1 in inference mode: the model clamps before
            # embedding, and generate's repetition penalty uses -1 to exclude
            # audio slots from prompt token counts (speech_dataset contract)
            return {
                "input_ids": input_ids,
                "attention_mask": np.ones_like(input_ids, np.int32),
                "audio_mel": mel,
                "audio_length": audio_length,
                "prompt_length": prompt_length,
                "key": key,
                "target": target,
            }

        example = self.tokenizer.encode(PROMPT_TEMPLATE.format(self.prompt) + str(target))
        example = list(example) + [self.tokenizer.eos_token_id]
        example_ids = np.concatenate([audio_pseudo, np.asarray(example, np.int64)])
        labels = example_ids.copy()
        labels[: audio_length + prompt_length] = IGNORE_INDEX
        input_ids = example_ids.copy()
        input_ids[input_ids == -1] = 0
        return {
            "input_ids": input_ids,
            "labels": labels,
            "attention_mask": np.ones_like(input_ids, np.int32),
            "audio_mel": mel,
            "audio_length": audio_length,
            "prompt_length": prompt_length,
            "key": key,
            "target": target,
        }


def get_mir_dataset(dataset_config, tokenizer, split: str) -> MIRDatasetJsonl:
    return MIRDatasetJsonl(dataset_config, tokenizer, split)
