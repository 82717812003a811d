"""Break the E-step into stages and time each on the real chip."""

import time
import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from tehmm_tpu.utils.platform import setup_jax

setup_jax()  # persistent compile cache: repeat runs skip compiles

from tehmm_tpu.models.emission import (
    track_log_likelihoods, expected_emission_counts,
)
from tehmm_tpu.ops import pallas_kernels as pk
from tools.bench_engines import make_inputs, CONFIGS


def timeit(fn, *args, iters=10):
    """Per-stage marginal rate via the shared two-point protocol
    (tehmm_tpu.utils.profiling.marginal_time) — a single averaged chain
    bundles the fixed ~25-30 ms dispatch/fetch round trip into every
    stage, inflating the few-ms stages up to ~2x."""
    from tehmm_tpu.utils.profiling import marginal_time

    return marginal_time(
        lambda: fn(*args),
        lambda out: float(jnp.sum(jax.tree.leaves(out)[0])),
        iters,
    )


def main():
    import sys
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else (
        "S20", "S64", "S128", "S256")
    for name in names:
        S, T, V, B, L = CONFIGS[name]
        params, symbols = make_inputs(S, T, V, B, L)
        obs = track_log_likelihoods(params.log_em, symbols)
        o_m = jnp.max(obs, axis=-1)
        obs_p = jnp.exp(obs - o_m[..., None])
        obs_p = jax.block_until_ready(obs_p)
        lengths = jnp.full((B,), L, jnp.int32)

        t_obs = timeit(jax.jit(
            lambda le, sy: track_log_likelihoods(le, sy)
        ), params.log_em, symbols)

        @jax.jit
        def obsp(le, sy):
            o = track_log_likelihoods(le, sy)
            m = jnp.max(o, axis=-1)
            return jnp.exp(o - m[..., None]), m

        t_obsp = timeit(obsp, params.log_em, symbols)
        t_fwd = timeit(
            pk.forward_prob_pallas_v3,
            params.log_start, params.log_trans, obs_p, lengths)
        t_bwd = timeit(
            pk.backward_prob_pallas_v3,
            params.log_trans, obs_p, lengths)

        alpha_p, dms = pk.forward_prob_pallas_v3(
            params.log_start, params.log_trans, obs_p, lengths)
        beta_p = pk.backward_prob_pallas_v3(
            params.log_trans, obs_p, lengths)

        @jax.jit
        def epilogue(params, alpha_p, beta_p, obs_p, symbols):
            ab = alpha_p * beta_p
            gamma = ab / jnp.maximum(
                jnp.sum(ab, -1, keepdims=True), 1e-30)
            a_fac = alpha_p[:, :-1, :]
            xb = obs_p[:, 1:, :] * beta_p[:, 1:, :]
            b_fac = xb / jnp.maximum(
                jnp.max(xb, -1, keepdims=True), 1e-30)
            trans_exp = jnp.exp(params.log_trans)
            aT = jnp.einsum("bli,ij->blj", a_fac, trans_exp,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            z = jnp.sum(aT * b_fac, axis=-1)
            w = 1.0 / jnp.maximum(z, 1e-30)
            pair = jnp.einsum("bli,blj->ij", a_fac * w[..., None], b_fac,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
            em = expected_emission_counts(
                params.log_em.shape, symbols, gamma)
            return pair * trans_exp, em, gamma[:, 0, :].sum(0)

        t_epi = timeit(
            epilogue, params, alpha_p, beta_p, obs_p, symbols)

        tot = t_obsp + t_fwd + t_bwd + t_epi
        print(f"{name}: obs={t_obs*1e3:.2f} obs_p={t_obsp*1e3:.2f} "
              f"fwd={t_fwd*1e3:.2f} bwd={t_bwd*1e3:.2f} "
              f"epi={t_epi*1e3:.2f} sum={tot*1e3:.2f} ms "
              f"({B*L/tot/1e6:.1f}M pos/s if perfectly pipelined)",
              flush=True)


if __name__ == "__main__":
    main()
