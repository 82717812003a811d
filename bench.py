"""Benchmark harness: Baum-Welch EM throughput on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload = BASELINE.md milestone config #3 shape class: 20-state,
5-track, unsupervised EM over chunked sequences, single chip.

* value: DP cell-updates/sec for one full EM iteration, counting the
  forward + backward recurrences (2 · positions · S²  updates) — the
  metric defined in BASELINE.json.
* vs_baseline: speedup over the reference-style implementation.  The
  reference (glennhickey/teHmm) is pure single-thread NumPy loops and
  publishes no numbers (BASELINE.md), and its mount is empty (SURVEY.md
  provenance), so the baseline is this repo's NumPy float64 oracle
  (tehmm_tpu/oracle.py — written in the reference's O(L·S²) loop style).
  Its per-position time is PINNED (tools/oracle_baseline.json,
  median-of-9 protocol recorded there; tools/pin_oracle_baseline.py
  re-measures) so the headline is stable run to run; a live slice
  measurement is only the fallback when the pinned file is missing.
  Extra diagnostic fields don't hurt the driver contract.
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tehmm_tpu import oracle
    from tehmm_tpu.models.params import init_random
    from tehmm_tpu.ops import em as em_ops
    from tehmm_tpu.utils.platform import setup_jax

    setup_jax()

    S, T, V = 20, 5, 8
    # Shape sweep on v5e (2026-08): B=16/L=8192 gave 3.7M pos/s (scan-step
    # latency bound); widening the chunk batch amortizes it: B=512 41.5M,
    # B=1024 67.1M, B=2048/L=1024 76.4M pos/s.  2M positions/iteration.
    B, L = 2048, 1024
    # Two-point marginal-rate protocol: the tunneled backend charges a
    # fixed ~25-30 ms pipeline-fill + scalar-fetch round trip to any
    # timed chain regardless of its length (measured: 7.4 ms/iter at
    # n=5, 2.3 ms/iter at n=80 for the SAME program).  Timing two chain
    # lengths and taking (T2 - T1) / (n2 - n1) isolates the per-
    # iteration device throughput — what a convergence-scale EM run
    # actually sustains — while the raw amortized numbers stay in
    # `detail` for transparency.
    iters1, iters2 = 10, 60

    rng = np.random.RandomState(0)
    params = init_random(S, [V] * T, seed=0)
    symbols = jnp.asarray(
        rng.randint(1, V, size=(B, L, T)), dtype=jnp.int32
    )
    lengths = jnp.full((B,), L, dtype=jnp.int32)
    sizes = jnp.asarray([V] * T)

    def step(params, symbols, lengths):
        stats = em_ops.em_sufficient_stats(params, symbols, lengths)
        return em_ops.em_m_step(stats, params, sizes), stats.loglik

    # warmup / compile.  NOTE: on the tunneled axon backend
    # block_until_ready can return before queued work drains; a scalar
    # fetch (float) is the only reliable full sync, so timings bracket
    # with float() fetches.
    p, ll = step(params, symbols, lengths)
    _ = float(ll)

    def chain(n):
        t0 = time.perf_counter()
        p = params
        for _ in range(n):
            p, ll = step(p, symbols, lengths)
        _ = float(ll)
        return time.perf_counter() - t0

    t1 = chain(iters1)
    t2 = chain(iters2)
    dt = (t2 - t1) / (iters2 - iters1)     # marginal: per-iter device time
    dt_amortized = t2 / iters2

    positions = B * L
    cells = 2 * positions * S * S          # fwd + bwd updates
    cells_per_sec = cells / dt

    # ---- reference-style NumPy baseline: PINNED measurement ----
    # Re-measuring the oracle each run made the headline speedup wobble
    # ±40% across artifacts (round-3 VERDICT).  The denominator is now a
    # one-time median-of-9 measurement (tools/pin_oracle_baseline.py →
    # tools/oracle_baseline.json, protocol recorded there); a live
    # measurement is only taken if the pinned file is missing.
    pin_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools", "oracle_baseline.json",
    )
    ref_source = "pinned"
    try:
        with open(pin_path) as f:
            ref_dt_per_pos = json.load(f)["value"]
    except (OSError, KeyError, ValueError):
        ref_source = "live"
        L_ref = 512
        sym_ref = np.asarray(symbols[0, :L_ref])
        ls = np.asarray(params.log_start, np.float64)
        lt = np.asarray(params.log_trans, np.float64)
        le = np.asarray(params.log_em, np.float64)
        t0 = time.perf_counter()
        obs = oracle.obs_log_likelihoods(le, sym_ref)
        oracle.baum_welch_counts(ls, lt, obs, sym_ref, V)
        ref_dt_per_pos = (time.perf_counter() - t0) / L_ref
    ref_dt = ref_dt_per_pos * positions
    speedup = ref_dt / dt

    print(json.dumps({
        "metric": "baum_welch_cell_updates_per_sec_per_chip",
        "value": round(cells_per_sec, 1),
        "unit": "cellupdates/s",
        "vs_baseline": round(speedup, 2),
        "detail": {
            "device": str(jax.devices()[0]),
            "config": {"S": S, "T": T, "V": V, "B": B, "L": L},
            "em_iter_seconds": round(dt, 5),
            "em_iter_seconds_amortized": round(dt_amortized, 5),
            "chain_seconds": {str(iters1): round(t1, 4),
                              str(iters2): round(t2, 4)},
            "positions_per_sec": round(positions / dt, 1),
            "em_iters_per_sec": round(1.0 / dt, 3),
            "numpy_ref_iter_seconds_scaled": round(ref_dt, 3),
            "numpy_ref_source": ref_source,
        },
    }))


if __name__ == "__main__":
    main()
