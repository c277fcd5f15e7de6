"""AV-HuBERT dataset (VSR / AVSR): lip-crop video (+ optional audio) -> text.

Mirrors reference ``datasets/avhubert_dataset.py`` / ``avsr_dataset.py``:
jsonl rows ``{key, video, source?, target}``; cv2 grayscale load, center
(eval) / random (train) crop to 88x88, normalize with AV-HuBERT's (0.421,
0.165) stats; audio as 26x4 stacked logfbank at the 25 fps video rate;
token assembly identical to the speech dataset."""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import numpy as np

from slam_llm_tpu.data.speech_dataset import (
    IGNORE_INDEX,
    PROMPT_TEMPLATE,
    SpeechDatasetJsonl,
    bucketize,
)
from slam_llm_tpu.models.avhubert import stacked_logfbank
from slam_llm_tpu.ops import audio as audio_ops

DEFAULT_VSR_PROMPT = "Transcribe the silent speech in this video to text. "
CROP = 88
MEAN, STD = 0.421, 0.165


def load_video_gray(path: str, train: bool = False, rng=None) -> np.ndarray:
    """(T, 88, 88) float32 normalized grayscale frames."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        frames.append(gray)
    cap.release()
    if not frames:
        raise ValueError(f"no frames in {path}")
    v = np.stack(frames).astype(np.float32) / 255.0
    t, h, w = v.shape
    if h < CROP or w < CROP:
        v = np.pad(v, ((0, 0), (0, max(0, CROP - h)), (0, max(0, CROP - w))))
        t, h, w = v.shape
    if train and rng is not None:
        y0 = int(rng.integers(0, h - CROP + 1))
        x0 = int(rng.integers(0, w - CROP + 1))
    else:
        y0, x0 = (h - CROP) // 2, (w - CROP) // 2
    v = v[:, y0 : y0 + CROP, x0 : x0 + CROP]
    if train and rng is not None and rng.uniform() < 0.5:
        # RandomHorizontalFlip(0.5) train augmentation (reference
        # datasets/vision_transform.py:97, avhubert_dataset pipeline)
        v = v[:, :, ::-1]
    return (v - MEAN) / STD


class AVHubertDatasetJsonl(SpeechDatasetJsonl):
    def __init__(self, dataset_config, tokenizer=None, split: str = "train"):
        orig = getattr(dataset_config, "input_type", "mel")
        dataset_config.input_type = "mel"  # bypass parent's raw/mel assert
        try:
            super().__init__(dataset_config, tokenizer, split)
        finally:
            dataset_config.input_type = orig
        self.modal = getattr(dataset_config, "modal", "video")  # video | audio_video
        self.ds_rate = getattr(dataset_config, "encoder_projector_ds_rate", 5)
        self.rng = np.random.default_rng(42)
        if getattr(dataset_config, "prompt", None) is None:
            self.prompt = DEFAULT_VSR_PROMPT

    def __getitem__(self, index: int) -> Dict[str, Any]:
        item = self.data_list[index]
        target = item.get("target")
        key = item.get("key")
        video = load_video_gray(item["video"], train=self.split == "train", rng=self.rng)
        audio_feats = None
        if self.modal == "audio_video" and item.get("source"):
            wav = audio_ops.load_audio(item["source"])
            audio_feats = stacked_logfbank(wav)
            t = min(video.shape[0], audio_feats.shape[0])
            video, audio_feats = video[:t], audio_feats[:t]
        audio_length = video.shape[0] // self.ds_rate
        if self.fix_length_audio > 0:
            audio_length = self.fix_length_audio

        prompt_ids = self.tokenizer.encode(PROMPT_TEMPLATE.format(self.prompt))
        prompt_length = len(prompt_ids)
        pseudo = np.full((audio_length,), -1, np.int64)

        base = {
            "visual": video.astype(np.float32),
            "audio_feats": audio_feats,
            "audio_length": audio_length,
            "prompt_length": prompt_length,
            "key": key,
            "target": target,
        }
        if self.inference_mode:
            input_ids = np.concatenate([pseudo, np.asarray(prompt_ids, np.int64)])
            # pseudo ids stay -1 in inference mode: the model clamps before
            # embedding, and generate's repetition penalty uses -1 to exclude
            # audio slots from prompt token counts (speech_dataset contract)
            base.update(
                input_ids=input_ids,
                attention_mask=np.ones_like(input_ids, np.int32),
            )
            return base

        example = self.tokenizer.encode(PROMPT_TEMPLATE.format(self.prompt) + str(target))
        example = list(example) + [self.tokenizer.eos_token_id]
        ids = np.concatenate([pseudo, np.asarray(example, np.int64)])
        labels = ids.copy()
        labels[: audio_length + prompt_length] = IGNORE_INDEX
        ids[ids == -1] = 0
        base.update(
            input_ids=ids,
            labels=labels,
            attention_mask=np.ones_like(ids, np.int32),
        )
        return base

    def collator(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        out = self.collate_text(samples)
        b = len(samples)
        t_max = max(s["visual"].shape[0] for s in samples)
        visual = np.zeros((b, t_max, CROP, CROP), np.float32)
        visual_mask = np.zeros((b, t_max), np.int32)
        for i, s in enumerate(samples):
            t = s["visual"].shape[0]
            visual[i, :t] = s["visual"]
            visual_mask[i, :t] = 1
        out["visual"] = visual
        out["visual_mask"] = visual_mask
        if samples[0].get("audio_feats") is not None:
            f = samples[0]["audio_feats"].shape[1]
            feats = np.zeros((b, t_max, f), np.float32)
            for i, s in enumerate(samples):
                if s["audio_feats"] is not None:
                    t = min(s["audio_feats"].shape[0], t_max)
                    feats[i, :t] = s["audio_feats"][:t]
            out["audio_feats"] = feats
        return out


def get_avhubert_dataset(dataset_config, tokenizer, split: str) -> AVHubertDatasetJsonl:
    return AVHubertDatasetJsonl(dataset_config, tokenizer, split)
