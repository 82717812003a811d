"""compare-bed-states: accuracy between two BED annotations
(reference: compareBedStates.py; SURVEY.md §2b, §5 "Evaluation").

Computes base-level and interval-level precision/recall/F1 per state
between a prediction BED and a truth BED, plus a confusion summary.
Interval matching tolerates boundary slack (--slack).

Usage:
  python -m tehmm_tpu.cli.compare_bed_states truth.bed pred.bed [--slack N]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict

from tehmm_tpu.io import read_bed_intervals


def base_level_confusion(
    truth: list[tuple], pred: list[tuple]
) -> dict[tuple[str, str], int]:
    """Overlap length between every (truthName, predName) pair via a
    sorted boundary sweep (no per-base arrays — genome-safe)."""
    conf: dict[tuple[str, str], int] = defaultdict(int)
    by_chrom_t: dict[str, list] = defaultdict(list)
    by_chrom_p: dict[str, list] = defaultdict(list)
    for c, s, e, n in truth:
        by_chrom_t[c].append((s, e, str(n)))
    for c, s, e, n in pred:
        by_chrom_p[c].append((s, e, str(n)))
    for chrom in set(by_chrom_t) | set(by_chrom_p):
        t = sorted(by_chrom_t.get(chrom, []))
        p = sorted(by_chrom_p.get(chrom, []))
        ti = pi = 0
        while ti < len(t) and pi < len(p):
            ts, te, tn = t[ti]
            ps, pe, pn = p[pi]
            lo, hi = max(ts, ps), min(te, pe)
            if lo < hi:
                conf[(tn, pn)] += hi - lo
            if te <= pe:
                ti += 1
            else:
                pi += 1
    return dict(conf)


def base_level_prf(
    conf: dict[tuple[str, str], int]
) -> dict[str, dict[str, float]]:
    """Per-state precision/recall/F1 from the confusion overlap matrix."""
    states = sorted(
        {t for t, _ in conf} | {p for _, p in conf}
    )
    out = {}
    for s in states:
        tp = conf.get((s, s), 0)
        fn = sum(v for (t, p), v in conf.items() if t == s and p != s)
        fp = sum(v for (t, p), v in conf.items() if p == s and t != s)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[s] = {
            "precision": prec, "recall": rec, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn,
        }
    return out


def interval_level_prf(
    truth: list[tuple], pred: list[tuple], slack: int = 0
) -> dict[str, dict[str, float]]:
    """An interval matches if an interval of the same name on the other
    side overlaps it with boundaries within ``slack`` bases (reference:
    compareBedStates boundary-slack tolerance [R?])."""

    def matches(a, b) -> bool:
        if a[0] != b[0] or str(a[3]) != str(b[3]):
            return False
        if slack > 0:
            return abs(a[1] - b[1]) <= slack and abs(a[2] - b[2]) <= slack
        return max(a[1], b[1]) < min(a[2], b[2])

    def match_count(src, dst):
        by_chrom: dict[str, list] = defaultdict(list)
        for iv in dst:
            by_chrom[iv[0]].append(iv)
        for c in by_chrom:
            by_chrom[c].sort(key=lambda x: x[1])
        counts: dict[str, int] = defaultdict(int)
        totals: dict[str, int] = defaultdict(int)
        for iv in src:
            name = str(iv[3])
            totals[name] += 1
            lo = iv[1] - max(slack, 1) - 1
            hi = iv[2] + max(slack, 1) + 1
            for other in by_chrom.get(iv[0], []):
                if other[2] < lo:
                    continue
                if other[1] > hi:
                    break
                if matches(iv, other):
                    counts[name] += 1
                    break
        return counts, totals

    t_matched, t_total = match_count(truth, pred)
    p_matched, p_total = match_count(pred, truth)
    states = sorted(set(t_total) | set(p_total))
    out = {}
    for s in states:
        rec = t_matched.get(s, 0) / t_total[s] if t_total.get(s) else 0.0
        prec = (
            p_matched.get(s, 0) / p_total[s] if p_total.get(s) else 0.0
        )
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[s] = {"precision": prec, "recall": rec, "f1": f1,
                  "n_truth": t_total.get(s, 0), "n_pred": p_total.get(s, 0)}
    return out


def compare_bed_files(
    truth_path: str, pred_path: str, slack: int = 0
) -> dict:
    truth = read_bed_intervals(truth_path, ncol=4)
    pred = read_bed_intervals(pred_path, ncol=4)
    conf = base_level_confusion(truth, pred)
    total = sum(conf.values())
    correct = sum(v for (t, p), v in conf.items() if t == p)
    return {
        "base_accuracy": correct / total if total else 0.0,
        "base": base_level_prf(conf),
        "interval": interval_level_prf(truth, pred, slack),
        "confusion": {f"{t}|{p}": v for (t, p), v in sorted(conf.items())},
    }


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="compare-bed-states",
        description="Base- and interval-level accuracy between two BEDs",
    )
    p.add_argument("truthBed")
    p.add_argument("predBed")
    p.add_argument("--slack", type=int, default=0,
                   help="interval boundary slack in bases")
    p.add_argument("--json", action="store_true",
                   help="machine-readable JSON output")
    return p


def main(argv=None) -> int:
    opts = make_parser().parse_args(argv)
    res = compare_bed_files(opts.truthBed, opts.predBed, opts.slack)
    if opts.json:
        print(json.dumps(res, indent=1))
        return 0
    print(f"base accuracy: {res['base_accuracy']:.4f}")
    print(f"{'state':12s} {'prec':>7s} {'rec':>7s} {'f1':>7s}   "
          f"{'i-prec':>7s} {'i-rec':>7s} {'i-f1':>7s}")
    states = sorted(set(res["base"]) | set(res["interval"]))
    for s in states:
        b = res["base"].get(s, {})
        i = res["interval"].get(s, {})
        print(
            f"{s:12s} {b.get('precision', 0):7.4f} "
            f"{b.get('recall', 0):7.4f} {b.get('f1', 0):7.4f}   "
            f"{i.get('precision', 0):7.4f} {i.get('recall', 0):7.4f} "
            f"{i.get('f1', 0):7.4f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
