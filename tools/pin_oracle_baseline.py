"""Pin the NumPy-oracle baseline time used by bench.py's vs_baseline.

The reference (glennhickey/teHmm) publishes no numbers and its mount is
empty (SURVEY.md provenance), so the baseline denominator is this repo's
float64 NumPy oracle (tehmm_tpu/oracle.py, reference-style O(L·S²)
loops).  Re-measuring it inside every bench.py run made the headline
speedup wobble ±40% across artifacts (round-3 VERDICT weak #2).  This
tool measures it ONCE — fixed seed/shape, median of N repetitions — and
records the result in tools/oracle_baseline.json; bench.py reads the
pinned value and only falls back to a live measurement if the file is
missing.

Run it on the benchmark host and commit the JSON:
    python tools/pin_oracle_baseline.py
"""

import json
import os
import platform
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "oracle_baseline.json")

# bench.py flagship workload (BASELINE.md milestone config #3 shape class)
S, T, V = 20, 5, 8
L_REF = 512          # oracle slice length (full B·L would take minutes)
REPS = 9             # median of 9 single-threaded runs
SEED = 0


def measure() -> dict:
    from tehmm_tpu import oracle
    from tehmm_tpu.models.params import init_random

    rng = np.random.RandomState(SEED)
    params = init_random(S, [V] * T, seed=SEED)
    # same symbol distribution as bench.py's device workload
    sym_ref = rng.randint(1, V, size=(L_REF, T)).astype(np.int32)
    ls = np.asarray(params.log_start, np.float64)
    lt = np.asarray(params.log_trans, np.float64)
    le = np.asarray(params.log_em, np.float64)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        obs = oracle.obs_log_likelihoods(le, sym_ref)
        oracle.baum_welch_counts(ls, lt, obs, sym_ref, V)
        times.append(time.perf_counter() - t0)

    med = statistics.median(times)
    return {
        "metric": "numpy_oracle_em_iter_seconds_per_position",
        "value": med / L_REF,
        "unit": "s/position",
        "protocol": {
            "shape": {"S": S, "T": T, "V": V, "L_ref": L_REF},
            "seed": SEED,
            "reps": REPS,
            "statistic": "median",
            "times_s": [round(t, 6) for t in times],
        },
        "host": {
            "machine": platform.machine(),
            "processor": platform.processor(),
            "python": platform.python_version(),
            "numpy": np.__version__,
        },
    }


def main() -> None:
    rec = measure()
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    print(json.dumps({"pinned_s_per_position": rec["value"],
                      "spread": rec["protocol"]["times_s"],
                      "out": OUT}))


if __name__ == "__main__":
    main()
