"""Offline CTC-filtered hotword selection for contextual ASR.

Reference: examples/contextual_asr/dataset/hotwordsinfer_dataset.py — its
``infer_type`` modes (nobias / gt / filter) ran inside the dataset; here the
same selection is a one-shot preprocessing pass that writes the
per-utterance ``hotwords`` field of the decode manifest, which
``slam_llm_tpu.data.speech_dataset`` folds into the prompt.

Inputs are line-aligned with the manifest (the reference indexes the same
way): the TSV biasing file carries ``...\thotwords\tbiaswords`` python-repr
list columns (reference :104-111), the CTC file one first-pass transcript
per line (reference :115-118).

Usage:
  python examples/contextual_asr/filter_hotwords.py \
      --manifest test.jsonl --output test_hotwords.jsonl \
      --infer-file ref.tsv --ctc-file wavlm_ctc.txt \
      [--mode filter|gt|nobias] [--common-words common5k.txt] \
      [--threshold 0.95] [--word-num 15]
"""

from __future__ import annotations

import argparse
import ast
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slam_llm_tpu.utils.hotword_filter import build_ngram_index, filter_hotwords


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--manifest", required=True, help="input jsonl {key,source,target}")
    ap.add_argument("--output", required=True, help="output jsonl with hotwords field")
    ap.add_argument("--infer-file", required=True,
                    help="TSV with python-repr hotwords (col 3) / biaswords (col 4)")
    ap.add_argument("--ctc-file", default=None,
                    help="first-pass transcripts, one per line (filter mode)")
    ap.add_argument("--mode", choices=("filter", "gt", "nobias"), default="filter")
    ap.add_argument("--common-words", default=None,
                    help="one common word per line; dropped from the CTC sentence")
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--word-num", type=int, default=15)
    args = ap.parse_args(argv)

    rows = [json.loads(l) for l in open(args.manifest, encoding="utf-8") if l.strip()]
    gt_lists, bias_lists = [], []
    with open(args.infer_file, encoding="utf-8") as f:
        for line in f:
            cols = line.rstrip("\n").split("\t")
            gt_lists.append(ast.literal_eval(cols[2]))
            bias_lists.append(ast.literal_eval(cols[3]))
    if len(gt_lists) != len(rows):
        raise SystemExit(f"{args.infer_file}: {len(gt_lists)} lines != {len(rows)} manifest rows")

    common = None
    if args.common_words:
        common = {w.strip() for w in open(args.common_words, encoding="utf-8") if w.strip()}

    ctc = None
    if args.mode == "filter":
        if not args.ctc_file:
            raise SystemExit("--ctc-file is required in filter mode")
        ctc = [l.strip() for l in open(args.ctc_file, encoding="utf-8")]
        if len(ctc) != len(rows):
            raise SystemExit(f"{args.ctc_file}: {len(ctc)} lines != {len(rows)} manifest rows")

    total_gt = missed = prompt_words = 0
    with open(args.output, "w", encoding="utf-8") as out:
        for i, row in enumerate(rows):
            if args.mode == "nobias":
                words = []
            elif args.mode == "gt":
                words = [w.upper() for w in gt_lists[i]]
            else:
                index = build_ngram_index(bias_lists[i])
                words = filter_hotwords(
                    ctc[i], bias_lists[i], common_words=common,
                    probability_threshold=args.threshold, word_num=args.word_num,
                    ngram_index=index,
                )
                # recall accounting (reference :204-216)
                for name in gt_lists[i]:
                    total_gt += 1
                    if name not in words:
                        missed += 1
                words = [w.upper() for w in words]
            prompt_words += len(words)
            row = dict(row)
            row["hotwords"] = words
            out.write(json.dumps(row, ensure_ascii=False) + "\n")

    if args.mode == "filter" and total_gt:
        print(f"recall: {1 - missed / total_gt:.4f} ({total_gt - missed}/{total_gt}); "
              f"avg prompt words: {prompt_words / len(rows):.1f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
