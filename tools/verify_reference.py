"""Reference-day verification: run the moment /root/reference is populated.

SURVEY.md §7 "Verify-first checklist" + VERDICT round-1 missing item #1:
every golden in tests/data/golden derives from this repo's own float64
oracle because the reference mount was EMPTY at survey and build time.
This script turns the checklist into one command:

    python tools/verify_reference.py [--reference /root/reference]
                                     [--out /tmp/ref_verify]

Stages (each prints PASS/FAIL/SKIP and the evidence):

1. mount       — is the reference populated at all?
2. inventory   — key files exist (basehmm.py, emission.py, teHmmTrain.py,
                 cfg.py ...), native components (.pyx/.c), test fixtures.
3. cites       — grep the landmark symbols SURVEY.md reconstructed
                 ([R]/[R?] rows) so they can be upgraded to file:line.
4. run         — execute the reference's teHmmTrain/teHmmEval on the
                 bundled tests/data fixtures (tries python3, then 2to3
                 into a scratch dir) to produce REFERENCE goldens.
5. diff        — compare reference outputs against tests/data/golden
                 (BED paths must match bit-exact; trained parameter
                 tables to f32 tolerance) and against this framework's
                 own outputs.

Exit code: 0 when every non-skipped stage passes.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "tests", "data")
GOLD = os.path.join(DATA, "golden")

KEY_FILES = [
    "basehmm.py", "emission.py", "hmm.py", "cfg.py", "track.py",
    "trackIO.py", "common.py", "teHmmTrain.py", "teHmmEval.py",
]

LANDMARKS = [
    ("basehmm.py", "def _do_forward_pass"),
    ("basehmm.py", "logsumexp"),
    ("emission.py", "class IndependentMultinomial"),
    ("emission.py", "class PairEmissionModel"),
    ("teHmmTrain.py", "segLen"),
    ("cfg.py", "class MultitrackCfg"),
]


def report(stage: str, status: str, detail: str = "") -> bool:
    print(f"[{status:<4}] {stage}: {detail}" if detail
          else f"[{status}] {stage}", flush=True)
    return status != "FAIL"


def find_file(ref: str, name: str) -> str | None:
    for root, _dirs, files in os.walk(ref):
        if name in files:
            return os.path.join(root, name)
    return None


def stage_mount(ref: str) -> bool:
    n = sum(len(fs) for _r, _d, fs in os.walk(ref))
    if n == 0:
        report("mount", "FAIL", f"{ref} is EMPTY — goldens remain "
               "oracle-derived; nothing to verify against")
        return False
    return report("mount", "PASS", f"{n} files under {ref}")


def stage_inventory(ref: str) -> bool:
    ok = True
    for name in KEY_FILES:
        path = find_file(ref, name)
        ok &= report(f"inventory {name}",
                     "PASS" if path else "FAIL", path or "not found")
    native = subprocess.run(
        ["find", ref, "-name", "*.pyx", "-o", "-name", "*.c",
         "-o", "-name", "*.cpp"],
        capture_output=True, text=True,
    ).stdout.strip()
    report("inventory native", "INFO",
           native or "no native sources (SURVEY said pure NumPy)")
    fixtures = find_file(ref, "tests") or os.path.join(ref, "tests")
    report("inventory fixtures", "INFO",
           fixtures if os.path.isdir(fixtures) else "no tests dir")
    return ok


def stage_cites(ref: str) -> bool:
    ok = True
    for fname, pattern in LANDMARKS:
        path = find_file(ref, fname)
        if path is None:
            ok &= report(f"cite {fname}:{pattern}", "FAIL", "file missing")
            continue
        hits = []
        with open(path, errors="replace") as fh:
            for i, line in enumerate(fh, 1):
                if pattern in line:
                    hits.append(i)
        ok &= report(
            f"cite {fname}:{pattern!r}",
            "PASS" if hits else "FAIL",
            f"{os.path.relpath(path, ref)}:{hits[:3]}" if hits
            else "symbol NOT found — SURVEY row was wrong, update it",
        )
    return ok


def _reference_python(ref: str, out: str) -> list[str] | None:
    """Find an interpreter + source tree that can import the reference
    (py2-era code may need 2to3 into a scratch copy)."""
    train = find_file(ref, "teHmmTrain.py")
    if train is None:
        return None
    src_root = os.path.dirname(train)
    probe = subprocess.run(
        [sys.executable, "-c",
         f"import sys; sys.path.insert(0, {src_root!r}); "
         "import teHmmTrain"],
        capture_output=True, text=True,
    )
    if probe.returncode == 0:
        return [sys.executable, train]
    scratch = os.path.join(out, "ref2to3")
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.copytree(src_root, scratch)
    conv = subprocess.run(
        [sys.executable, "-m", "lib2to3", "-w", "-n", scratch],
        capture_output=True, text=True,
    )
    if conv.returncode != 0:
        report("run 2to3", "FAIL", conv.stderr[-200:])
        return None
    return [sys.executable, os.path.join(scratch, "teHmmTrain.py")]


def _run(cmd, **kw) -> "subprocess.CompletedProcess | None":
    """subprocess.run that reports a hang as a result instead of
    crashing the checklist mid-run (the reference is py2-era code of
    unknown behavior — a hung script must yield FAIL, not a traceback
    that forfeits the PASS/FAIL summary and exit-code contract)."""
    try:
        return subprocess.run(
            cmd, capture_output=True, text=True, timeout=600, **kw
        )
    except subprocess.TimeoutExpired as e:
        cls = type("Timeout", (), {})
        r = cls()
        r.returncode = -1
        r.stdout = (e.stdout or b"")
        r.stderr = f"TIMEOUT after 600s: {cmd[:3]}..."
        return r


def stage_run_and_diff(ref: str, out: str) -> bool:
    os.makedirs(out, exist_ok=True)
    cmd = _reference_python(ref, out)
    if cmd is None:
        return report("run", "FAIL", "no runnable teHmmTrain.py found")
    tracks = os.path.join(DATA, "tracks.xml")
    truth = os.path.join(DATA, "truth.bed")
    regions = os.path.join(DATA, "regions.bed")
    model = os.path.join(out, "ref_model.mod")
    r = _run(cmd + [tracks, truth, model, "--supervised"])
    if r.returncode != 0:
        return report("run teHmmTrain", "FAIL", r.stderr[-300:])
    report("run teHmmTrain", "PASS", model)

    eval_cmd = [cmd[0], cmd[1].replace("teHmmTrain", "teHmmEval")]
    ref_bed = os.path.join(out, "ref_viterbi.bed")
    r = _run(eval_cmd + [tracks, model, regions, "--bed", ref_bed])
    if r.returncode != 0:
        return report("run teHmmEval", "FAIL", r.stderr[-300:])
    report("run teHmmEval", "PASS", ref_bed)

    ok = True
    golden_bed = os.path.join(GOLD, "viterbi.bed")
    if os.path.exists(golden_bed):
        same = _bed_equal(ref_bed, golden_bed)
        ok &= report(
            "diff reference vs golden BED",
            "PASS" if same else "FAIL",
            "bit-identical" if same else
            f"MISMATCH — replace tests/data/golden/viterbi.bed with "
            f"{ref_bed} (the reference output defines ground truth) "
            "and re-run the golden tests",
        )
    # our framework's output on the same fixtures (the golden npz is
    # the oracle's raw parameter dump without model metadata, so train
    # a real model through the CLI first — same recipe as test_golden)
    env = {**os.environ, "TEHMM_PLATFORM": "cpu", "PYTHONPATH": REPO}
    ours_model = os.path.join(out, "tpu_model.npz")
    ours_bed = os.path.join(out, "tpu_viterbi.bed")
    r = _run(
        [sys.executable, "-m", "tehmm_tpu", "train", tracks, truth,
         ours_model, "--supervised"], env=env,
    )
    if r.returncode != 0:
        return ok & report("run tehmm_tpu train", "FAIL", r.stderr[-300:])
    r = _run(
        [sys.executable, "-m", "tehmm_tpu", "eval", tracks,
         ours_model, regions, "--bed", ours_bed], env=env,
    )
    if r.returncode == 0:
        same = _bed_equal(ref_bed, ours_bed)
        ok &= report(
            "diff reference vs tehmm_tpu BED",
            "PASS" if same else "FAIL",
            "bit-identical" if same else "MISMATCH — investigate "
            "tie-breaking/EPSILON semantics (SURVEY §7 hard part #1)",
        )
    else:
        ok &= report("run tehmm_tpu eval", "FAIL", r.stderr[-300:])
    return ok


def _bed_equal(a: str, b: str) -> bool:
    def rows(p):
        with open(p) as fh:
            return [tuple(l.split()[:4]) for l in fh
                    if l.strip() and not l.startswith(("#", "track"))]
    return rows(a) == rows(b)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default="/tmp/ref_verify")
    args = ap.parse_args()

    if not stage_mount(args.reference):
        return 1
    ok = stage_inventory(args.reference)
    ok &= stage_cites(args.reference)
    ok &= stage_run_and_diff(args.reference, args.out)
    print("ALL PASS" if ok else "FAILURES — see above", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
