"""E-chat dataset: dialog manifest parsing, pair construction, answer
template, split, and end-to-end item/collation via the speech pipeline."""

import json
import wave

import numpy as np
import pytest

from slam_llm_tpu.data.echat_dataset import (
    EChatDataset,
    parse_echat_manifest,
    get_echat_dataset,
)
from slam_llm_tpu.data.tokenizer import ByteTokenizer


def _wav(path, seconds=0.2):
    sr = 16000
    t = np.linspace(0, seconds, int(sr * seconds), endpoint=False)
    pcm = (0.2 * np.sin(2 * np.pi * 330 * t) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(sr)
        f.writeframes(pcm.tobytes())
    return str(path)


@pytest.fixture()
def manifest(tmp_path):
    wav = _wav(tmp_path / "turn.wav")
    dialog = [
        {"wav": wav, "emotion": "neutral", "trans": "hello there"},
        {"wav": wav, "emotion": "happy", "trans": "hi, great to see you"},
        {"wav": wav, "emotion": "xxx", "trans": "unlabeled"},
        {"wav": wav, "emotion": "sad", "trans": "oh no"},
    ]
    path = tmp_path / "dialogs.tsv"
    lines = []
    for d in range(12):  # enough rows for a 90/10 split
        lines.append(f"dlg{d}\t{json.dumps(dialog)}")
    path.write_text("\n".join(lines))
    return str(path)


def test_parse_pairs_and_template(manifest):
    recs = parse_echat_manifest(manifest)
    # per dialog: (0->1) valid, (1->2) dropped (xxx), (2->3) valid
    assert len(recs) == 12 * 2
    assert recs[0]["target"] == "<|happy|><|hi, great to see you|>"
    assert recs[1]["target"] == "<|sad|><|oh no|>"
    assert recs[0]["source"].endswith("turn.wav")


def test_split_and_items(manifest):
    class C:
        data_path = manifest
        mel_size = 8
        inference_mode = False

    tok = ByteTokenizer()
    train = EChatDataset(C(), tok, "train")
    val = EChatDataset(C(), tok, "val")
    assert len(train) == 21 and len(val) == 3  # 90/10 of 24
    item = train[0]
    assert (item["labels"][: item["audio_length"] + item["prompt_length"]] == -100).all()
    batch = train.collator([train[0], train[1]])
    assert batch["input_ids"].shape[0] == 2
    assert batch["modality_mask"].sum(axis=1).tolist() == [
        train[0]["audio_length"], train[1]["audio_length"]
    ]


def test_python_literal_manifest(tmp_path, manifest):
    """The reference's data files are python literals (single quotes)."""
    wav = _wav(tmp_path / "t.wav")
    p = tmp_path / "lit.tsv"
    p.write_text(
        "d0\t[{'wav': '%s', 'emotion': 'angry', 'trans': 'x'}, "
        "{'wav': '%s', 'emotion': 'happy', 'trans': 'y'}]" % (wav, wav)
    )
    recs = parse_echat_manifest(str(p))
    assert len(recs) == 1 and recs[0]["emotion"] == "happy"
