"""fit-state-names: rename anonymous learned states to truth names
(reference: fitStateNames.py; SURVEY.md §2b — greedy overlap/F1
assignment of unsupervised state numbers to truth labels, then a renamed
BED is written so compare-bed-states can score it).

Usage:
  python -m tehmm_tpu.cli.fit_state_names truth.bed pred.bed out.bed
"""

from __future__ import annotations

import argparse
import sys

from tehmm_tpu.io import read_bed_intervals, write_bed_intervals
from tehmm_tpu.cli.compare_bed_states import base_level_confusion


def fit_names(
    truth: list[tuple], pred: list[tuple]
) -> dict[str, str]:
    """Greedy 1:1 assignment pred-name -> truth-name by descending base
    overlap; unassigned prediction names keep themselves."""
    conf = base_level_confusion(truth, pred)
    pairs = sorted(conf.items(), key=lambda kv: -kv[1])
    mapping: dict[str, str] = {}
    used_truth: set[str] = set()
    for (t_name, p_name), _overlap in pairs:
        if p_name in mapping or t_name in used_truth:
            continue
        mapping[p_name] = t_name
        used_truth.add(t_name)
    return mapping


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="fit-state-names",
        description="Greedily map predicted state names onto truth names",
    )
    p.add_argument("truthBed")
    p.add_argument("predBed")
    p.add_argument("outBed")
    p.add_argument("--printMap", action="store_true")
    return p


def main(argv=None) -> int:
    opts = make_parser().parse_args(argv)
    truth = read_bed_intervals(opts.truthBed, ncol=4)
    pred = read_bed_intervals(opts.predBed, ncol=4)
    mapping = fit_names(truth, pred)
    if opts.printMap:
        for p_name, t_name in sorted(mapping.items()):
            print(f"{p_name}\t{t_name}")
    renamed = [
        (c, s, e, mapping.get(str(n), str(n))) for c, s, e, n in pred
    ]
    write_bed_intervals(renamed, opts.outBed)
    return 0


if __name__ == "__main__":
    sys.exit(main())
