"""tsd-finder: locate Target Site Duplications flanking candidate TEs
(reference: tsdFinder.py; SURVEY.md §2b, §3.5).

A TE insertion duplicates a short target sequence: the same few bases
appear immediately left of the element start and immediately right of
the element end.  For each candidate element interval this tool hashes
the k-mers of the left flanking window (kmer.KmerTable), probes the
right flanking window, extends exact seed hits, and keeps the
best-scoring duplication within the length bounds.  Both TSD copies are
written as BED intervals (name = ``<element>_TSD`` or --name).

Usage:
  python -m tehmm_tpu.cli.tsd_finder genome.fa candidates.bed out.bed
"""

from __future__ import annotations

import argparse
import sys

from tehmm_tpu.io import read_bed_intervals, write_bed_intervals
from tehmm_tpu.io.fasta import FastaFile
from tehmm_tpu.kmer import KmerTable


def find_tsd(
    fa: FastaFile,
    chrom: str,
    start: int,
    end: int,
    min_len: int = 4,
    max_len: int = 6,
    window: int = 15,
) -> tuple[tuple[int, int], tuple[int, int]] | None:
    """Best TSD pair for element [start, end).

    Returns ((left_start, left_end), (right_start, right_end)) in genome
    coordinates, or None.  Scoring: longest match wins (clipped at
    max_len); ties prefer copies closest to the element boundaries.
    """
    if chrom not in fa.names:
        return None
    w_left_start = max(0, start - window)
    left = fa.fetch(chrom, w_left_start, start)   # fetch() uppercases
    right = fa.fetch(chrom, end, end + window)
    if len(left) < min_len or len(right) < min_len:
        return None
    table = KmerTable(left, min_len)
    best = None
    for sp, qp, length in table.best_matches(right):
        if length < min_len:
            continue
        if length > max_len:
            # a match MUCH longer than max_len is a shared repeat/
            # homopolymer, not a TSD; but a genuine max_len TSD whose
            # copies chance-extend by a base or two must clip, not
            # vanish (the docstring's "clipped at max_len" contract —
            # rejecting outright lost real TSDs in AT-rich flanks)
            if length > max_len + 2:
                continue
            off = length - max_len     # any offset scores identically:
            sp, qp, length = sp + off, qp + off, max_len
        # distance of the left copy's end from the element start plus the
        # right copy's start from the element end (smaller = better)
        l_end_off = len(left) - (sp + length)
        dist = l_end_off + qp
        score = (length, -dist)
        if best is None or score > best[0]:
            best = (
                score,
                (w_left_start + sp, w_left_start + sp + length),
                (end + qp, end + qp + length),
            )
    if best is None:
        return None
    return best[1], best[2]


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tsd-finder",
        description="Find Target Site Duplications flanking candidate "
                    "elements",
    )
    p.add_argument("fastaSequence")
    p.add_argument("inBed", help="candidate TE elements")
    p.add_argument("outBed", help="output TSD intervals")
    p.add_argument("--min", type=int, default=4, dest="minLen",
                   help="minimum TSD length")
    p.add_argument("--max", type=int, default=6, dest="maxLen",
                   help="maximum TSD length")
    p.add_argument("--window", type=int, default=15,
                   help="flanking window searched on each side")
    p.add_argument("--name", default="TSD",
                   help="name given to output intervals")
    return p


def main(argv=None) -> int:
    opts = make_parser().parse_args(argv)
    fa = FastaFile(opts.fastaSequence)
    candidates = read_bed_intervals(opts.inBed, ncol=4)
    out = []
    for chrom, start, end, name in candidates:
        hit = find_tsd(
            fa, chrom, start, end,
            min_len=opts.minLen, max_len=opts.maxLen, window=opts.window,
        )
        if hit is None:
            continue
        (ls, le), (rs, re) = hit
        # named candidates keep their association: <element>_TSD
        label = opts.name if name is None else f"{name}_{opts.name}"
        out.append((chrom, ls, le, label))
        out.append((chrom, rs, re, label))
    write_bed_intervals(out, opts.outBed)
    print(f"found TSDs for {len(out) // 2} of {len(candidates)} "
          f"candidates", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
