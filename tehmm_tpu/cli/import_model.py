"""tehmm-import-model: convert a reference teHmm pickle to .npz
(reference: modelIO.py pickles [R]; SURVEY.md §2a modelIO row).

Usage:
  python -m tehmm_tpu import-model reference_model.mdl model.npz

Best-effort tolerant unpickling (io/refmodel.py): the teHmm classes
need not be importable; the converter mines the object graph for the
probability tables, state names and category maps, defaults what it
cannot recover (with a warning), and writes a model this framework's
eval/view tools load directly.
"""

from __future__ import annotations

import argparse
import sys

from tehmm_tpu.utils.common import (
    add_logging_options,
    set_logging_from_options,
)


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tehmm-import-model",
        description="convert a reference teHmm model pickle to .npz",
    )
    p.add_argument("inputPickle", help="reference model pickle (.mdl)")
    p.add_argument("outputModel", help="output model path (.npz)")
    add_logging_options(p)
    return p


def main(argv=None) -> int:
    opts = make_parser().parse_args(argv)
    set_logging_from_options(opts)

    from tehmm_tpu.io.refmodel import convert_reference_model

    try:
        rep = convert_reference_model(opts.inputPickle, opts.outputModel)
    except FileNotFoundError:
        raise SystemExit(f"not found: {opts.inputPickle}")
    except ValueError as e:
        raise SystemExit(str(e))
    print(f"wrote {opts.outputModel}")
    for line in rep["found"]:
        print(f"  recovered: {line}")
    for line in rep["defaulted"]:
        print(f"  DEFAULTED: {line}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
