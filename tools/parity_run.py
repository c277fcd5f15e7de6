"""One-command quality-parity harness: decode a recipe's test split and print
the measured metric next to the reference's published number (BASELINE.md).

The reference validates quality by manually running per-recipe shell scripts
and comparing to the README tables; here one command runs the whole chain —
config -> checkpoint load -> batch decode -> normalizer -> metric — so the
moment real checkpoints/data are available the BASELINE.md row is one
invocation away:

  python tools/parity_run.py asr_librispeech \
      --llm /ckpts/vicuna-7b-v1.5 --encoder /ckpts/wavlm-large.pt \
      --ckpt /exp/wavlm_vicuna/best \
      --data test-clean=/data/librispeech_test_clean.jsonl \
      --data test-other=/data/librispeech_test_other.jsonl

  python tools/parity_run.py aac_audiocaps \
      --llm /ckpts/vicuna-7b-v1.5 --encoder /ckpts/EAT-base_epoch30_ft.pt \
      --ckpt /exp/aac/best --data test=/data/audiocaps_test.jsonl

Each recipe entry pins the exact reference combo (config yaml), the decode
settings, the text normalizer the reference scores with, and the published
number. Extra ``++key=value`` overrides pass straight through to the config
system, which is how the CI fixture test drives the same code path on tiny
models (tests/test_parity_run.py).

Reference scoring chains mirrored here:
  ASR:  decode -> EnglishTextNormalizer both sides -> WER
        (reference utils/whisper_tn.py -> utils/compute_wer.py)
  AAC:  decode -> caption metric bundle incl. SPICE/SPIDEr
        (reference utils/compute_aac_metrics.py)
  VSR/MaLa: same WER chain as ASR.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


# ---------------------------------------------------------------------------
# per-recipe scoring chains
# ---------------------------------------------------------------------------


def _score_wer(pred: str, gt: str, workdir: Path, squash_repeats: bool = True) -> Dict[str, float]:
    from slam_llm_tpu.utils.textnorm import normalize_file
    from slam_llm_tpu.utils.wer import compute_wer_files

    pred_n = str(workdir / (Path(pred).name + ".norm"))
    gt_n = str(workdir / (Path(gt).name + ".norm"))
    normalize_file(pred, pred_n, squash_repeats=squash_repeats)
    normalize_file(gt, gt_n)
    res = compute_wer_files(gt_n, pred_n, str(workdir / "wer_detail"))
    return {"wer": res.wer}


def _score_captions(pred: str, gt: str, workdir: Path) -> Dict[str, float]:
    from slam_llm_tpu.utils.caption_metrics import main as caption_main

    return caption_main(gt, pred)


@dataclass
class Recipe:
    config: str  # conf yaml relative to examples/
    score: Callable[[str, str, Path], Dict[str, float]]
    published: List[Tuple[str, str, float, str]]  # (split, metric, value, source)
    combo: str  # human-readable model combo
    extra_overrides: List[str] = field(default_factory=list)


RECIPES: Dict[str, Recipe] = {
    "asr_librispeech": Recipe(
        config="examples/asr_librispeech/conf/asr_wavlm_vicuna.yaml",
        score=_score_wer,
        published=[
            ("test-clean", "wer", 2.28, "reference examples/asr_librispeech/README.md:13"),
            ("test-other", "wer", 4.78, "reference examples/asr_librispeech/README.md:13"),
        ],
        combo="WavLM-large + linear + vicuna-7b-v1.5",
    ),
    "aac_audiocaps": Recipe(
        config="examples/aac_audiocaps/conf/aac_eat_vicuna.yaml",
        score=_score_captions,
        published=[
            ("test", "meteor", 0.2508, "reference examples/aac_audiocaps/README.md:7"),
            ("test", "cider", 0.7532, "reference examples/aac_audiocaps/README.md:7"),
            ("test", "spice", 0.1853, "reference examples/aac_audiocaps/README.md:7"),
            ("test", "spider", 0.4692, "reference examples/aac_audiocaps/README.md:7"),
        ],
        combo="EAT-base-ft + linear + vicuna-7b-v1.5",
    ),
    "slam_aac_clotho": Recipe(
        config="examples/slam_aac/conf/slam_aac_eat_vicuna.yaml",
        score=_score_captions,
        published=[
            ("test", "meteor", 0.197, "reference examples/slam_aac/README.md:24"),
            ("test", "cider", 0.515, "reference examples/slam_aac/README.md:24"),
            ("test", "spice", 0.148, "reference examples/slam_aac/README.md:24"),
            ("test", "spider", 0.332, "reference examples/slam_aac/README.md:24"),
        ],
        combo="EAT + vicuna-7b + CLAP-Refine decode",
    ),
    "vsr_LRS3": Recipe(
        config="examples/vsr_LRS3/conf/vsr_avhubert_vicuna.yaml",
        score=_score_wer,
        published=[
            ("test", "wer", 29.47, "reference examples/vsr_LRS3/README.md:7"),
        ],
        combo="AV-HuBERT-large(self-train) + linear + vicuna-7b",
    ),
    "mala_asr_slidespeech": Recipe(
        config="examples/mala_asr_slidespeech/conf/mala_wavlm_vicuna.yaml",
        score=_score_wer,
        published=[
            ("dev", "wer", 8.91, "reference examples/mala_asr_slidespeech/README.md:19"),
            ("test", "wer", 9.14, "reference examples/mala_asr_slidespeech/README.md:19"),
        ],
        combo="WavLM-large + linear + vicuna-7b + OCR hotwords",
    ),
    "mc_musiccaps": Recipe(
        config="examples/mc_musiccaps/conf/mc_musicfm_vicuna.yaml",
        score=_score_captions,
        published=[
            ("test", "bleu_1", 0.256, "reference examples/mc_musiccaps/README.md:9"),
            ("test", "meteor", 0.100, "reference examples/mc_musiccaps/README.md:9"),
            ("test", "spice", 0.087, "reference examples/mc_musiccaps/README.md:9"),
            ("test", "spider", 0.069, "reference examples/mc_musiccaps/README.md:9"),
        ],
        combo="MusicFM-MSD + linear + vicuna-7b",
    ),
}


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


def run(
    recipe_name: str,
    data: Dict[str, str],
    llm: Optional[str] = None,
    encoder: Optional[str] = None,
    ckpt: Optional[str] = None,
    out_dir: Optional[str] = None,
    overrides: Optional[List[str]] = None,
) -> Dict[str, Dict[str, float]]:
    """Decode every named split and return {split: metrics}. Prints the
    published-vs-measured table."""
    recipe = RECIPES[recipe_name]
    from slam_llm_tpu.config import load_run_config
    from slam_llm_tpu.pipeline import inference_batch

    workdir = Path(out_dir or tempfile.mkdtemp(prefix=f"parity_{recipe_name}_"))
    workdir.mkdir(parents=True, exist_ok=True)

    results: Dict[str, Dict[str, float]] = {}
    for split, manifest in data.items():
        args = [f"--config={REPO / recipe.config}"] if (REPO / recipe.config).exists() else []
        args += recipe.extra_overrides
        args += [
            f"++dataset_config.val_data_path={manifest}",
            f"++dataset_config.train_data_path={manifest}",
            "++dataset_config.inference_mode=true",
            f"++decode_config.decode_log={workdir / f'decode_{split}'}",
        ]
        if llm:
            args.append(f"++model_config.llm_path={llm}")
        if encoder:
            args.append(f"++model_config.encoder_path={encoder}")
        if ckpt:
            args.append(f"++ckpt_path={ckpt}")
        args += overrides or []
        cfg = load_run_config(args)
        res = inference_batch.main(cfg)
        results[split] = {
            **recipe.score(res["pred"], res["gt"], workdir),
            "rtf": round(res["rtf"], 4),
            "n": res["n"],
        }

    # published-vs-measured table
    rows = []
    for split, metric, value, source in recipe.published:
        measured = results.get(split, {}).get(metric)
        rows.append((split, metric, value, measured, source))
    width = max(len(r[0]) for r in rows) if rows else 8
    print(f"\n== parity: {recipe_name} ({recipe.combo}) ==")
    print(f"{'split':{width}}  {'metric':8}  {'published':>9}  {'measured':>9}  source")
    for split, metric, value, measured, source in rows:
        m = f"{measured:9.4g}" if measured is not None else "   (no --data)"
        print(f"{split:{width}}  {metric:8}  {value:9.4g}  {m}  {source}")
    for split, metrics in results.items():
        print(f"[{split}] all metrics: {json.dumps(metrics)}")
    (workdir / "parity.json").write_text(json.dumps({"recipe": recipe_name, "results": results}))
    return results


def main(argv: Optional[List[str]] = None) -> Dict[str, Dict[str, float]]:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("recipe", choices=sorted(RECIPES))
    ap.add_argument("--data", action="append", default=[],
                    metavar="SPLIT=JSONL", help="named eval manifest; repeatable")
    ap.add_argument("--llm", help="HF LLM checkpoint dir (e.g. vicuna-7b-v1.5)")
    ap.add_argument("--encoder", help="encoder checkpoint (HF dir / fairseq .pt)")
    ap.add_argument("--ckpt", help="trained projector/LoRA checkpoint dir")
    ap.add_argument("--out", help="work dir for decode logs + parity.json")
    ap.add_argument("overrides", nargs="*", default=[],
                    help="extra ++key=value config overrides")
    ns, extra = ap.parse_known_args(argv)
    data = dict(d.split("=", 1) for d in ns.data)
    if not data:
        ap.error("at least one --data SPLIT=manifest.jsonl is required")
    return run(
        ns.recipe, data, llm=ns.llm, encoder=ns.encoder, ckpt=ns.ckpt,
        out_dir=ns.out, overrides=list(ns.overrides) + list(extra),
    )


if __name__ == "__main__":
    main()
