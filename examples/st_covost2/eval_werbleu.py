"""CoT-ST scoring: split chained `<transcript> <|lang|> <translation>` outputs
and report ASR WER + translation BLEU.

Mirrors the reference's scorer (reference examples/st_covost2/test_werbleu.py):
  * splits gt/response on the `<|lang|>` tag found in the gt;
  * WER: orthographic + BasicTextNormalizer-normalized (ours:
    slam_llm_tpu.utils.textnorm.basic_normalize), empty-ref rows dropped;
  * BLEU: sacrebleu-compatible corpus BLEU, lowercase, 13a tokenization
    (character-split for zh/ja targets).

Input: either the reference's results jsonl ({"gt","response","source"} rows)
via --file, or this repo's decode logs via --pred/--gt (key\ttext rows,
pipeline/inference_batch.py output).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from slam_llm_tpu.utils.bleu import TOKENIZERS, corpus_bleu, tokenize_13a
from slam_llm_tpu.utils.textnorm import basic_normalize
from slam_llm_tpu.utils.wer import compute_wer_lists

_LANG_TAG = re.compile(r"<\|([a-zA-Z_]+)\|>")


def _read_pairs(args):
    """yields (gt, response) pairs."""
    if args.file:
        for line in Path(args.file).read_text().splitlines():
            if not line.strip():
                continue
            row = json.loads(line)
            yield row["gt"], row["response"]
    else:
        def read_log(path):
            out = {}
            for line in Path(path).read_text().splitlines():
                if "\t" in line:
                    k, t = line.split("\t", 1)
                    out[k] = t
            return out

        gt, pred = read_log(args.gt), read_log(args.pred)
        for k in gt:
            yield gt[k], pred.get(k, "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", help="reference-format results jsonl")
    ap.add_argument("--pred", help="decode log: {decode_log}_pred")
    ap.add_argument("--gt", help="decode log: {decode_log}_gt")
    ap.add_argument("--task", default="st", choices=["st", "asr"])
    args = ap.parse_args()
    if not args.file and not (args.pred and args.gt):
        ap.error("need --file or --pred/--gt")

    resp_asr, resp_st, gt_asr, gt_st = [], [], [], []
    lang = None
    for gt, response in _read_pairs(args):
        if args.task == "asr":
            gt_asr.append(gt)
            resp_asr.append(response)
            continue
        m = _LANG_TAG.search(gt)
        if not m:
            # no CoT tag: score the whole string as translation
            gt_st.append(gt)
            resp_st.append(response)
            continue
        lang = m.group(1)
        tag = m.group(0)
        g1, g2 = (p.strip() for p in gt.split(tag, 1))
        rp = response.split(tag, 1)
        r1, r2 = (rp[0].strip(), rp[1].strip()) if len(rp) == 2 else (response, response)
        gt_asr.append(g1)
        gt_st.append(g2)
        resp_asr.append(r1)
        resp_st.append(r2)

    if gt_asr:
        wer_ortho = compute_wer_lists(gt_asr, resp_asr).wer
        norm_pairs = [
            (basic_normalize(p), basic_normalize(g))
            for p, g in zip(resp_asr, gt_asr)
        ]
        norm_pairs = [(p, g) for p, g in norm_pairs if g]
        wer_norm = (
            compute_wer_lists([g for _, g in norm_pairs], [p for p, _ in norm_pairs]).wer
            if norm_pairs
            else float("nan")
        )
        print(json.dumps({"wer_ortho": wer_ortho, "wer": wer_norm}))

    if args.task == "st" and gt_st:
        tok = TOKENIZERS.get((lang or "13a").split("_")[0], tokenize_13a)
        score, precisions, bp = corpus_bleu(
            [r.lower() for r in resp_st], [[g.lower()] for g in gt_st], tokenize=tok
        )
        print(json.dumps({
            "count": len(resp_st),
            "bleu": round(score, 2),
            "precisions": [round(p, 1) for p in precisions],
            "bp": round(bp, 3),
            "tokenize": "zh" if tok is not tokenize_13a else "13a",
        }))


if __name__ == "__main__":
    main()
