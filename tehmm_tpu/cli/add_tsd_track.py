"""add-tsd-track: run tsd-finder and splice the result into a tracks XML
(reference: addTsdTrack.py; SURVEY.md §2b).

Usage:
  python -m tehmm_tpu.cli.add_tsd_track tracks.xml genome.fa cand.bed \
      tsd.bed out.xml --name tsd
"""

from __future__ import annotations

import argparse
import sys

from tehmm_tpu.cli import tsd_finder
from tehmm_tpu.io.trackxml import Track, TrackList


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="add-tsd-track",
        description="Generate a TSD track and add it to the tracks XML",
    )
    p.add_argument("tracksInfo")
    p.add_argument("fastaSequence")
    p.add_argument("inBed", help="candidate TE elements")
    p.add_argument("outTsdBed", help="where the TSD BED is written")
    p.add_argument("outTracksInfo")
    p.add_argument("--name", default="tsd", help="new track name")
    p.add_argument("--min", type=int, default=4, dest="minLen")
    p.add_argument("--max", type=int, default=6, dest="maxLen")
    p.add_argument("--window", type=int, default=15)
    return p


def main(argv=None) -> int:
    opts = make_parser().parse_args(argv)
    # validate the XML and the new track name BEFORE the genome-scale
    # k-mer scan — a duplicate name used to die with a raw ValueError
    # after all the work, leaving outTracksInfo unwritten
    tl = TrackList(opts.tracksInfo)
    if tl.get_track_by_name(opts.name) is not None:
        raise SystemExit(
            f"track name {opts.name!r} already exists in "
            f"{opts.tracksInfo}"
        )
    rc = tsd_finder.main([
        opts.fastaSequence, opts.inBed, opts.outTsdBed,
        "--min", str(opts.minLen), "--max", str(opts.maxLen),
        "--window", str(opts.window),
    ])
    if rc:
        return rc
    tl.add(Track(
        name=opts.name, path=opts.outTsdBed, distribution="binary"
    ))
    tl.save_xml(opts.outTracksInfo)
    return 0


if __name__ == "__main__":
    sys.exit(main())
