"""SlideSpeech kaldi-dir -> jsonl manifest converter.

Reference examples/mala_asr_slidespeech/dataset/slidespeech_dataset.py:20-56
reads the corpus as kaldi-style files (``my_wav.scp``, ``utt2num_samples``,
``text``, ``hot_related/ocr_1gram_top50_mmr070_hotwords_list`` with
'$'-separated OCR keywords). Here that layout is converted ONCE into the
framework's uniform ``{key, source, target, hotwords, source_len}`` jsonl so
the standard static-shape speech dataset serves MaLa-ASR unchanged.

Usage:
  python examples/mala_asr_slidespeech/prepare_manifest.py \
      --scp-dir /data/slidespeech/train/ --output train.jsonl [--lower]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HOTWORDS_REL = "hot_related/ocr_1gram_top50_mmr070_hotwords_list"


def read_kv(path: str, maxsplit: int = 1):
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split(None, maxsplit)
            if parts:
                out[parts[0]] = parts[1] if len(parts) > 1 else None
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scp-dir", required=True,
                    help="dir with my_wav.scp, text, utt2num_samples, hot_related/")
    ap.add_argument("--output", required=True)
    ap.add_argument("--lower", action="store_true",
                    help="lowercase targets + hotwords (reference dataset_config.lower)")
    args = ap.parse_args(argv)

    d = args.scp_dir
    wavs = read_kv(os.path.join(d, "my_wav.scp"))
    texts = read_kv(os.path.join(d, "text"))
    ns_path = os.path.join(d, "utt2num_samples")
    num_samples = read_kv(ns_path) if os.path.exists(ns_path) else {}
    hw_path = os.path.join(d, HOTWORDS_REL)
    hotwords = read_kv(hw_path) if os.path.exists(hw_path) else {}

    n = skipped = 0
    with open(args.output, "w", encoding="utf-8") as out:
        for key, wav in wavs.items():
            target = texts.get(key)
            if not target:
                # a null target would be trained/scored as the string "None"
                skipped += 1
                continue
            hw = hotwords.get(key)
            words = [w for w in hw.split("$") if w] if hw else []
            if args.lower:
                target = target.lower() if target else target
                words = [w.lower() for w in words]
            row = {"key": key, "source": wav, "target": target, "hotwords": words}
            if key in num_samples and num_samples[key]:
                row["source_len"] = int(num_samples[key])
            out.write(json.dumps(row, ensure_ascii=False) + "\n")
            n += 1
    print(f"wrote {n} rows to {args.output}"
          + (f" (skipped {skipped} with empty transcripts)" if skipped else ""),
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
