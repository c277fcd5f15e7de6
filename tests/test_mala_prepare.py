"""SlideSpeech kaldi-dir -> jsonl conversion (reference
examples/mala_asr_slidespeech/dataset/slidespeech_dataset.py:20-56)."""

import json


def test_prepare_manifest(tmp_path, capsys):
    from examples.mala_asr_slidespeech.prepare_manifest import main

    d = tmp_path / "train"
    (d / "hot_related").mkdir(parents=True)
    (d / "my_wav.scp").write_text("utt1 /wav/a.wav\nutt2 /wav/b.wav\n")
    (d / "text").write_text("utt1 HELLO SLIDE WORLD\nutt2\n")
    (d / "utt2num_samples").write_text("utt1 16000\nutt2 32000\n")
    (d / "hot_related" / "ocr_1gram_top50_mmr070_hotwords_list").write_text(
        "utt1 SLIDE$KEYWORD$OCR\nutt2\n"
    )
    out = tmp_path / "train.jsonl"
    assert main(["--scp-dir", str(d), "--output", str(out)]) == 0
    rows = [json.loads(l) for l in open(out)]
    assert rows[0] == {
        "key": "utt1",
        "source": "/wav/a.wav",
        "target": "HELLO SLIDE WORLD",
        "hotwords": ["SLIDE", "KEYWORD", "OCR"],
        "source_len": 16000,
    }
    # utt2: empty text line -> row skipped (a null target would train the
    # literal string "None"); skip is reported on stderr
    assert len(rows) == 1

    # --lower mirrors dataset_config.lower
    assert main(["--scp-dir", str(d), "--output", str(out), "--lower"]) == 0
    rows = [json.loads(l) for l in open(out)]
    assert rows[0]["target"] == "hello slide world"
    assert rows[0]["hotwords"] == ["slide", "keyword", "ocr"]
    assert len(rows) == 1
