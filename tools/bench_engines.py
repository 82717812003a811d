"""On-device EM/DP engine benchmark + parity sweep (v5e).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_engines.py
       [--configs S20,S64,...] [--engines xla,pallas] [--iters N]

Timing protocol (memory: axon tunnel): warm up each jitted shape, then
bracket the timed loop with scalar fetches (block_until_ready can return
before the tunneled queue drains).  Reports positions/s, cell-updates/s
(pos x S^2) and MXU-matmul FLOP/s with the %-of-peak columns used by
BASELINE.md (peaks: 197e12 bf16, 197e12/4 f32-HIGHEST-equivalent —
stated assumption, see BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tehmm_tpu.utils.platform import setup_jax

setup_jax()  # persistent compile cache: repeat runs skip compiles

from tehmm_tpu.models.params import HmmParams
from tehmm_tpu.ops import em as em_ops

BF16_PEAK = 197e12  # v5e MXU peak (bf16 FLOP/s), public spec

CONFIGS = {
    # name: (S, T, V, B, L)
    "S20": (20, 5, 8, 2048, 1024),
    "S64": (64, 10, 12, 1024, 1024),
    "S128": (128, 15, 16, 512, 1024),
    "S256": (256, 20, 16, 256, 1024),
}


def make_inputs(S, T, V, B, L, seed=0):
    rng = np.random.RandomState(seed)
    start = rng.dirichlet(np.ones(S))
    trans = rng.dirichlet(np.ones(S), size=S)
    log_em = np.zeros((S, T, V), np.float32)
    for t in range(T):
        p = rng.dirichlet(np.ones(V - 1), size=S)
        log_em[:, t, 1:] = np.log(p)
    params = HmmParams(
        log_start=jnp.asarray(np.log(start), jnp.float32),
        log_trans=jnp.asarray(np.log(trans), jnp.float32),
        log_em=jnp.asarray(log_em),
    )
    symbols = jnp.asarray(rng.randint(1, V, size=(B, L, T)), jnp.int32)
    return params, symbols


def marginal_time(run, sync, iters):
    """Two-point marginal rate — ONE shared implementation
    (tehmm_tpu.utils.profiling.marginal_time; see its docstring for the
    protocol rationale).  Kept as a name here because bench_cfg /
    bench_decode_roofline / profile_estep historically import it from
    this module."""
    from tehmm_tpu.utils.profiling import marginal_time as _mt

    return _mt(run, sync, iters)


def time_estep(params, symbols, engine, iters):
    def run():
        return em_ops.em_sufficient_stats(params, symbols, engine=engine)

    st = run()
    _sync = float(st.loglik)
    dt = marginal_time(run, lambda s: float(s.loglik), iters)
    return dt, _sync


def time_decode(params, symbols, engine, iters):
    from tehmm_tpu.models.emission import track_log_likelihoods
    from tehmm_tpu.ops import dp
    from tehmm_tpu.ops import pallas_kernels as pk

    if engine == "fused":
        @jax.jit
        def run(params, symbols):
            return pk.viterbi_fused_pallas_v4(
                params.log_start, params.log_trans, params.log_em,
                symbols,
            )
    else:
        fn = dp.viterbi if engine == "xla" else pk.viterbi_pallas_v3

        @jax.jit
        def run(params, symbols):
            obs = track_log_likelihoods(params.log_em, symbols)
            return fn(params.log_start, params.log_trans, obs)

    paths, _ = run(params, symbols)
    dt = marginal_time(
        lambda: run(params, symbols), lambda o: float(o[1].sum()), iters
    )
    return dt, int(jnp.sum(paths))


def time_maxpost(params, symbols, engine, iters):
    """--maxPost decode: fused v4 vs the XLA fwd/bwd/argmax pipeline."""
    from tehmm_tpu.models.emission import track_log_likelihoods
    from tehmm_tpu.ops import dp
    from tehmm_tpu.ops import pallas_kernels as pk

    if engine in ("pallas", "fused"):
        @jax.jit
        def run(params, symbols):
            return pk.posterior_decode_fused_pallas_v4(
                params.log_start, params.log_trans, params.log_em,
                symbols,
            )
    else:
        @jax.jit
        def run(params, symbols):
            obs = track_log_likelihoods(params.log_em, symbols)
            ah, _, _ = dp.forward_scaled(
                params.log_start, params.log_trans, obs
            )
            bh, _ = dp.backward_scaled(params.log_trans, obs)
            return jnp.argmax(dp.posterior_scaled(ah, bh), axis=-1)

    path = run(params, symbols)
    dt = marginal_time(
        lambda: run(params, symbols), lambda p: int(p[0, 0]), iters
    )
    return dt, float(jnp.sum(path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="S20,S64,S128,S256")
    ap.add_argument("--engines", default="xla,pallas")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--decode", action="store_true",
                    help="benchmark Viterbi decode (obs + values + "
                         "backtrace) instead of the EM E-step")
    ap.add_argument("--maxpost", action="store_true",
                    help="benchmark max-posterior decode (teHmmEval "
                         "--maxPost) instead of the EM E-step")
    args = ap.parse_args()

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind}", flush=True)
    rows = []
    for name in args.configs.split(","):
        S, T, V, B, L = CONFIGS[name]
        params, symbols = make_inputs(S, T, V, B, L)
        lls = {}
        for engine in args.engines.split(","):
            if args.decode:
                dt, ll = time_decode(params, symbols, engine, args.iters)
            elif args.maxpost:
                dt, ll = time_maxpost(params, symbols, engine, args.iters)
            else:
                dt, ll = time_estep(params, symbols, engine, args.iters)
            lls[engine] = ll
            pos_s = B * L / dt
            cells = pos_s * S * S
            # matmul FLOPs actually issued per E-step position:
            # fwd + bwd scans (2x 2*S^2) + aT/pair einsums (2x 2*S^2)
            # + obs one-hot matmul (2*S*T*V) + em-counts (2*S*T*V)
            flops = B * L * (8 * S * S + 4 * S * T * V) / dt
            row = dict(
                config=name, S=S, T=T, V=V, B=B, L=L, engine=engine,
                estep_ms=round(dt * 1e3, 2),
                positions_per_s=round(pos_s),
                cellupdates_per_s=round(cells),
                mxu_flops_per_s=round(flops),
                pct_bf16_peak=round(100 * flops / BF16_PEAK, 2),
                loglik=ll,
            )
            rows.append(row)
            print(json.dumps(row), flush=True)
        if len(lls) == 2:
            a, b = lls.values()
            rel = abs(a - b) / max(abs(a), 1e-9)
            print(f"# {name} engine loglik rel-delta: {rel:.3e}",
                  flush=True)
    print("# done", flush=True)


if __name__ == "__main__":
    main()
