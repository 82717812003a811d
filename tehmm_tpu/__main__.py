"""Unified CLI dispatcher: ``python -m tehmm_tpu <tool> [args...]``.

Maps reference-style tool names onto the cli submodules, e.g.

    python -m tehmm_tpu train tracks.xml labels.bed model.npz --supervised
    python -m tehmm_tpu compare-bed-states truth.bed pred.bed
"""

from __future__ import annotations

import importlib
import sys

TOOLS = {
    "train": "tehmm_tpu.cli.train",
    "eval": "tehmm_tpu.cli.eval",
    "view": "tehmm_tpu.cli.view",
    "benchmark": "tehmm_tpu.cli.benchmark",
    "compare-bed-states": "tehmm_tpu.cli.compare_bed_states",
    "fit-state-names": "tehmm_tpu.cli.fit_state_names",
    "segment-tracks": "tehmm_tpu.cli.segment_tracks",
    "set-track-scaling": "tehmm_tpu.cli.set_track_scaling",
    "track-dump": "tehmm_tpu.cli.track_dump",
    "bed-tools": "tehmm_tpu.cli.bed_tools",
    "tsd-finder": "tehmm_tpu.cli.tsd_finder",
    "add-tsd-track": "tehmm_tpu.cli.add_tsd_track",
    "track-ranking": "tehmm_tpu.cli.track_ranking",
    "clean-external": "tehmm_tpu.cli.clean_external",
    "import-model": "tehmm_tpu.cli.import_model",
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m tehmm_tpu <tool> [args...]\n\ntools:")
        for name in sorted(TOOLS):
            print(f"  {name}")
        return 0 if argv else 2
    tool, *rest = argv
    mod_name = TOOLS.get(tool)
    if mod_name is None:
        print(f"unknown tool {tool!r}; run with --help for the list",
              file=sys.stderr)
        return 2
    mod = importlib.import_module(mod_name)
    try:
        rc = mod.main(rest)
        # flush HERE so a tail still sitting in the stdout buffer when
        # a pager closed the pipe raises where this handler can catch
        # it (interpreter-shutdown flush would print an ignored-
        # exception message and exit 120 instead)
        sys.stdout.flush()
        return rc
    except BrokenPipeError:
        # downstream pager/head closed the pipe (e.g. `view m | head`)
        # — no traceback, and exit 141 (128+SIGPIPE, the Unix
        # convention) so wrapping scripts can distinguish truncated
        # from complete output.  Redirect stdout to devnull so the
        # interpreter's exit-time flush cannot re-raise.
        import os

        os.dup2(os.open(os.devnull, os.O_WRONLY), 1)
        return 141


if __name__ == "__main__":
    sys.exit(main())
