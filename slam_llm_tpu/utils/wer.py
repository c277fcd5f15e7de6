"""WER with full alignment + per-utterance diff report.

Functional mirror of the reference's ``utils/compute_wer.py:38-197``: same
kaldi-style inputs (``key<tab>text`` per line), same aggregate lines
(``%WER .. [ w / n, i ins, d del, s sub ]``, ``%SER``), same per-utterance
ref/hyp/diff detail file — so existing eval tooling keeps working. The
alignment itself is a vectorized numpy Levenshtein (the reference uses a
python double loop)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np

OK, SUB, INS, DEL = 0, 1, 2, 3


def align(hyp: Sequence[str], ref: Sequence[str]) -> Tuple[Dict[str, int], List[Tuple[int, int, int]]]:
    """Levenshtein alignment: returns counts + backtrace path
    [(op, hyp_idx, ref_idx)]. Lowercases both sides like the reference."""
    hyp = [w.lower() for w in hyp]
    ref = [w.lower() for w in ref]
    lh, lr = len(hyp), len(ref)
    cost = np.zeros((lh + 1, lr + 1), dtype=np.int32)
    cost[:, 0] = np.arange(lh + 1)
    cost[0, :] = np.arange(lr + 1)
    ops = np.zeros((lh + 1, lr + 1), dtype=np.int8)
    ops[1:, 0] = INS
    ops[0, 1:] = DEL
    for i in range(1, lh + 1):
        # vectorized row update (still a dependency chain along j for the
        # delete transition; do it with a scan over j in numpy)
        prev = cost[i - 1]
        row = cost[i]
        for j in range(1, lr + 1):
            match = hyp[i - 1] == ref[j - 1]
            c_sub = prev[j - 1] + (0 if match else 1)
            c_ins = prev[j] + 1
            c_del = row[j - 1] + 1
            best = min(c_sub, c_ins, c_del)
            row[j] = best
            ops[i, j] = (OK if match else SUB) if best == c_sub else (INS if best == c_ins else DEL)

    path = []
    i, j = lh, lr
    counts = {"cor": 0, "sub": 0, "ins": 0, "del": 0}
    while i > 0 or j > 0:
        op = ops[i, j]
        if i > 0 and j > 0 and op in (OK, SUB):
            path.append((int(op), i - 1, j - 1))
            counts["cor" if op == OK else "sub"] += 1
            i, j = i - 1, j - 1
        elif i > 0 and (j == 0 or op == INS):
            path.append((INS, i - 1, -1))
            counts["ins"] += 1
            i -= 1
        else:
            path.append((DEL, -1, j - 1))
            counts["del"] += 1
            j -= 1
    path.reverse()
    return counts, path


def diff_line(hyp: Sequence[str], ref: Sequence[str], path) -> str:
    out = []
    for op, hi, ri in path:
        if op == OK:
            out.append(hyp[hi].lower())
        elif op == SUB:
            out.append(f"({ref[ri].lower()}->{hyp[hi].lower()})")
        elif op == INS:
            out.append(f"(+{hyp[hi].lower()})")
        else:
            out.append(f"(-{ref[ri].lower()})")
    return " ".join(out)


@dataclass
class WerResult:
    wer: float = 0.0
    ser: float = 0.0
    words: int = 0
    errors: int = 0
    ins: int = 0
    dels: int = 0
    subs: int = 0
    sentences: int = 0
    wrong_sentences: int = 0

    def summary(self) -> str:
        return (
            f"%WER {self.wer} [ {self.errors} / {self.words}, {self.ins} ins, "
            f"{self.dels} del, {self.subs} sub ]\n"
            f"%SER {self.ser} [ {self.wrong_sentences} / {self.sentences} ]"
        )


def read_trn(path: str) -> Dict[str, List[str]]:
    """key<tab-or-space>words per line (the reference's decode-log format)."""
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split()
            if parts:
                out[parts[0]] = parts[1:]
    return out


def compute_wer_files(ref_file: str, hyp_file: str, detail_file: str = None) -> WerResult:
    """File-level WER matching the reference CLI (utils/compute_wer.py:38)."""
    refs, hyps = read_trn(ref_file), read_trn(hyp_file)
    res = WerResult()
    lines = []
    for key, hyp in hyps.items():
        if key not in refs:
            continue
        ref = refs[key]
        counts, path = align(hyp, ref)
        wrong = counts["sub"] + counts["ins"] + counts["del"]
        res.words += len(ref)
        res.ins += counts["ins"]
        res.dels += counts["del"]
        res.subs += counts["sub"]
        res.errors += wrong
        res.sentences += 1
        if wrong:
            res.wrong_sentences += 1
        if detail_file:
            nref = max(len(ref), 1)
            lines.append(
                f"{key} wer {round(wrong * 100 / nref, 2)} [ {wrong} / {len(ref)}, "
                f"{counts['ins']} ins, {counts['del']} del, {counts['sub']} sub ]"
            )
            lines.append("ref:\t" + " ".join(w.lower() for w in ref))
            lines.append("hyp:\t" + " ".join(w.lower() for w in hyp))
            lines.append("diff:\t" + diff_line(hyp, ref, path))
    if res.words:
        res.wer = round(res.errors * 100 / res.words, 2)
    if res.sentences:
        res.ser = round(res.wrong_sentences * 100 / res.sentences, 2)
    if detail_file:
        with open(detail_file, "w", encoding="utf-8") as f:
            f.write("\n".join(lines))
            f.write("\n\n" + res.summary() + "\n")
            f.write(
                f"Scored {len(hyps)} sentences, {len(hyps) - res.sentences} not present in hyp.\n"
            )
    return res


def compute_wer_lists(refs: Sequence[str], hyps: Sequence[str]) -> WerResult:
    """In-memory WER over parallel lists of sentences."""
    res = WerResult()
    for ref_s, hyp_s in zip(refs, hyps):
        ref, hyp = ref_s.split(), hyp_s.split()
        counts, _ = align(hyp, ref)
        wrong = counts["sub"] + counts["ins"] + counts["del"]
        res.words += len(ref)
        res.ins += counts["ins"]
        res.dels += counts["del"]
        res.subs += counts["sub"]
        res.errors += wrong
        res.sentences += 1
        if wrong:
            res.wrong_sentences += 1
    if res.words:
        res.wer = round(res.errors * 100 / res.words, 2)
    if res.sentences:
        res.ser = round(res.wrong_sentences * 100 / res.sentences, 2)
    return res
