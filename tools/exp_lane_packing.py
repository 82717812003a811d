"""Small-S lane-packing experiment (round-5; round-4 VERDICT weak #1).

Hypothesis under test: at the S=20 flagship the fused engines use 20 of
128 lanes and run at 10-16% of their ceilings; packing G=6 independent
chunk groups into the lane dimension with a block-diagonal [G*S, G*S]
transition (symbols pre-interleaved host-side, so no per-step relayouts)
could approach the S=128 engines' 62-73% ceiling utilization.

This tool measures the UPPER BOUND of that design without writing the
packed kernels: a real packed kernel runs the existing engine math at
state width G*S over B/G rows, PLUS per-block segmented work the packed
formulation cannot avoid (the scaled scans' per-step normalizers, the
E-step's transition-pair normalizer and gamma normalization, and the
decode argmaxes are all per-chunk reductions — over lanes within a
block once packed).  So timing the UNMODIFIED engines at (S=G*Sref,
B/G, same L) and crediting them with G positions per packed position is
strictly optimistic for packing.  If even this bound fails 2x, the
packed kernels cannot win.

Usage:  python tools/exp_lane_packing.py [--iters 8]
Writes one result line per (engine, config); summary verdict at the end.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--S", type=int, default=20)
    p.add_argument("--G", type=int, default=6)
    p.add_argument("--B", type=int, default=2048)
    p.add_argument("--L", type=int, default=1024)
    p.add_argument("--T", type=int, default=5)
    p.add_argument("--V", type=int, default=8)
    opts = p.parse_args(argv)

    from tehmm_tpu.utils.platform import setup_jax

    setup_jax()

    import jax
    import jax.numpy as jnp

    from tehmm_tpu.models.params import init_random
    from tehmm_tpu.ops import em as em_ops
    from tehmm_tpu.ops import pallas_kernels as pk
    from tehmm_tpu.utils.profiling import marginal_time

    S, G, B, L, T, V = (
        opts.S, opts.G, opts.B, opts.L, opts.T, opts.V
    )
    Bp = max(1, B // G)
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}")
    print(
        f"flagship: S={S} B={B} L={L} T={T} V={V}  |  packed bound: "
        f"S={G * S} B={Bp} L={L} (x{G} positions per row)"
    )

    def inputs(S_, B_):
        params = init_random(S_, [V] * T, seed=0)
        sym = jnp.asarray(
            rng.randint(1, V, size=(B_, L, T)), jnp.int32
        )
        lens = jnp.full((B_,), L, jnp.int32)
        return params, sym, lens

    rows = []

    def bench(name, S_, B_, factor, make_run):
        t = marginal_time(*make_run(S_, B_), iters=opts.iters)
        pos = B_ * L * factor
        rows.append((name, S_, B_, factor, t, pos / t))
        print(
            f"  {name:<22} S={S_:<4} B={B_:<5} {t * 1e3:8.2f} ms  "
            f"{pos / t / 1e6:9.1f}M useful pos/s"
        )

    # ---- E-step (fused v4) ----
    def estep(S_, B_):
        params, sym, lens = inputs(S_, B_)

        def run():
            return em_ops.em_sufficient_stats(params, sym, lens)

        return run, (lambda st: float(st.loglik))

    # ---- fused Viterbi decode ----
    def viterbi(S_, B_):
        params, sym, lens = inputs(S_, B_)

        def run():
            return pk.viterbi_fused_pallas_v4(
                params.log_start, params.log_trans, params.log_em,
                sym, lens,
            )

        return run, (lambda out: float(out[1][0]))

    # ---- fused maxPost decode ----
    def maxpost(S_, B_):
        params, sym, lens = inputs(S_, B_)

        def run():
            return pk.posterior_decode_fused_pallas_v4(
                params.log_start, params.log_trans, params.log_em,
                sym, lens,
            )

        return run, (lambda out: int(np.asarray(out[0, 0])))

    engines = [("estep", estep), ("viterbi", viterbi),
               ("maxpost", maxpost)]
    verdicts = {}
    for name, mk in engines:
        print(f"[{name}]")
        bench(f"{name} flagship", S, B, 1, mk)
        bench(f"{name} packed-bound", G * S, Bp, G, mk)
        base, packed = rows[-2][5], rows[-1][5]
        verdicts[name] = packed / base
        print(f"  -> packed upper bound = {packed / base:.2f}x flagship")

    print("\nverdict:")
    for name, ratio in verdicts.items():
        call = "WIN possible" if ratio >= 2.0 else "NEGATIVE"
        print(
            f"  {name}: upper bound {ratio:.2f}x "
            f"(adoption bar 2x) -> {call}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
