"""tehmm-train: train a multi-track HMM (reference: teHmmTrain.py).

Modes (SURVEY.md §2b):
  --supervised            state = BED name column of the training regions
  (default)               unsupervised Baum-Welch EM over --numStates
  semi-supervised         --initTransProbs/--initEmProbs text priors plus
                          --fixTrans/--fixEm/--forceTransProbs/
                          --forceEmProbs pin parts of the tables

Usage:
  python -m tehmm_tpu.cli.train tracks.xml training.bed output.mod [flags]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from tehmm_tpu.io import TrackList, load_track_data, read_bed_intervals
from tehmm_tpu.io.bed import get_merged_bed_intervals
from tehmm_tpu.io import priors as priors_io
from tehmm_tpu.models.hmm import MultitrackHmm
from tehmm_tpu.models.params import HmmParams, apply_emission_conventions
from tehmm_tpu.ops import em as em_ops
from tehmm_tpu.utils.common import (
    EPSILON,
    JsonlMetrics,
    add_logging_options,
    logger,
    set_logging_from_options,
)


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tehmm-train",
        description="Train a multi-track HMM on genomic annotation tracks",
    )
    p.add_argument("tracksInfo", help="tracks XML config file")
    p.add_argument("trainingBed", help="training regions BED")
    p.add_argument("outputModel", help="output model path (.npz)")
    p.add_argument("--supervised", action="store_true",
                   help="train from the BED name column (state labels)")
    p.add_argument("--numStates", type=int, default=2,
                   help="number of states for unsupervised EM")
    p.add_argument("--iter", type=int, default=100,
                   help="maximum EM iterations")
    p.add_argument("--emThresh", type=float, default=0.001,
                   help="EM convergence threshold on delta log-likelihood")
    p.add_argument("--flatEm", action="store_true",
                   help="flat (uniform) emission initialization")
    p.add_argument("--emRandRange", default="0.1,0.9",
                   help="random emission init range lo,hi")
    p.add_argument("--seed", type=int, default=0, help="RNG seed")
    p.add_argument("--reps", type=int, default=1,
                   help="random restarts; best final loglik wins. "
                        "Restarts batch into ONE vmapped device program "
                        "unless --mesh/--deviceLoop is given (those run "
                        "restarts sequentially, R x wall-clock)")
    p.add_argument("--numThreads", type=int, default=1,
                   help="accepted for reference compatibility; restarts "
                        "run sequentially here (a single accelerator "
                        "serializes them anyway)")
    p.add_argument("--initTransProbs", default=None,
                   help="transition prior text file (init values)")
    p.add_argument("--fixTrans", action="store_true",
                   help="freeze transitions at their initial values")
    p.add_argument("--forceTransProbs", default=None,
                   help="transition text file applied AFTER training")
    p.add_argument("--initEmProbs", default=None,
                   help="emission prior text file (init values)")
    p.add_argument("--fixEm", action="store_true",
                   help="freeze emissions at their initial values")
    p.add_argument("--forceEmProbs", default=None,
                   help="emission text file applied AFTER training")
    p.add_argument("--cfg", action="store_true",
                   help="wrap the trained model as a pair-grammar CFG "
                        "(reference: teHmmTrain.py --cfg)")
    p.add_argument("--pairStates", default="",
                   help="comma-separated state names that emit paired "
                        "(nested) left/right ends")
    p.add_argument("--maxSpan", type=int, default=4096,
                   help="with --cfg: maximum pair-bracket span (bounds "
                        "the CYK chart; also the window for the "
                        "unsupervised match-bonus fit)")
    p.add_argument("--matchBonus", type=float, default=None,
                   help="per-track log bonus when pair-state end symbols "
                        "match (reference: PairEmissionModel weighting). "
                        "Default: LEARNED — supervised counting of pair-"
                        "end agreement (--supervised) or an inside-"
                        "likelihood fit (EM mode)")
    p.add_argument("--cfgEm", type=int, default=0, metavar="N",
                   help="with --cfg + --pairStates: refine the model "
                        "with N inside-outside EM iterations under the "
                        "pair grammar itself (start/transitions/"
                        "emissions and the per-state match bonus are "
                        "learned from pair-event posteriors; "
                        "models/cfg_em.py). Tables are windowed to "
                        "--maxSpan. Default 0: HMM-train then fit pair "
                        "weights (reference behavior)")
    p.add_argument("--saPrior", type=float, default=None,
                   help="with --cfg: self-alignment prior in (0, 1) — "
                        "probability that a pair state expands with the "
                        "pair rule rather than a plain left emission "
                        "(reference: teHmmTrain.py --saPrior). Default: "
                        "no prior")
    p.add_argument("--segment", action="store_true",
                   help="training BED contains segment-tracks output: "
                        "one observation per segment interval "
                        "(reference: teHmmTrain.py --segment)")
    p.add_argument("--segLen", action="store_true",
                   help="with --segment: weight each segment's emission "
                        "log-probability by its base length "
                        "(reference: effectiveSegmentLength scaling)")
    p.add_argument("--chunk", type=int, default=1 << 14,
                   help="EM chunk length (positions per sequence)")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard EM over this many devices (0 = single, "
                        "or all global devices under multi-host)")
    p.add_argument("--coordinatorAddress", default=None,
                   metavar="HOST:PORT",
                   help="multi-host training: process-0 coordinator "
                        "address (jax.distributed; SURVEY.md §7 layer "
                        "6). Launch one identical invocation per host "
                        "with --numProcesses/--processId")
    p.add_argument("--numProcesses", type=int, default=None,
                   help="multi-host: total number of processes")
    p.add_argument("--processId", type=int, default=None,
                   help="multi-host: this process's rank (0-based)")
    p.add_argument("--checkpoint", default=None,
                   help="periodic checkpoint path")
    p.add_argument("--checkpointEvery", type=int, default=10)
    p.add_argument("--deviceLoop", action="store_true",
                   help="run the whole EM loop as ONE device dispatch "
                        "(no per-iteration logging/checkpointing; wins "
                        "only when per-iteration host latency dominates "
                        "tiny workloads — see ops/em.em_run)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of training "
                        "into DIR (TensorBoard/Perfetto viewable)")
    p.add_argument("--initModel", default=None,
                   help="resume EM from a saved model instead of a fresh "
                        "initialization (reference: --initModel-style "
                        "restart from pickle; SURVEY.md §5 checkpoint/"
                        "resume)")
    add_logging_options(p)
    return p


def main(argv=None) -> int:
    from tehmm_tpu.utils.platform import setup_jax

    setup_jax()
    opts = make_parser().parse_args(argv)
    is_proc0 = True
    if opts.coordinatorAddress is not None:
        from tehmm_tpu.parallel.mesh import initialize_distributed
        import jax

        initialize_distributed(
            opts.coordinatorAddress, opts.numProcesses, opts.processId
        )
        is_proc0 = jax.process_index() == 0
        if not opts.mesh:
            opts.mesh = jax.device_count()
        if not is_proc0:
            opts.checkpoint = None
    set_logging_from_options(opts)
    metrics = JsonlMetrics(opts.logJson if is_proc0 else None)

    track_list = TrackList(opts.tracksInfo)
    # training regions: merged span of the BED (reference:
    # getMergedBedIntervals over the training file)
    regions = get_merged_bed_intervals(opts.trainingBed)
    logger.info("loading %d tracks over %d regions",
                len(track_list), len(regions))
    if opts.segment and opts.supervised:
        raise SystemExit("--segment is an EM-mode option; combine the "
                         "segments with labels via --supervised training "
                         "on base-resolution data instead")

    init_model = None
    init_maps = None
    if opts.initModel and not opts.supervised:
        # resume: symbols MUST come from the saved model's category maps
        # (new unseen values map to missing, as at eval time)
        init_model = MultitrackHmm.load(opts.initModel)
        init_maps = init_model.category_maps

    seg_tables = None
    if opts.segment:
        from tehmm_tpu.io.segments import load_segment_data

        seg_ivs = read_bed_intervals(opts.trainingBed, ncol=3)
        track_data, seg_tables = load_segment_data(
            track_list, seg_ivs, category_maps=init_maps
        )
        logger.info(
            "segment mode: %d segments in %d chains",
            sum(len(t) for t in seg_tables), len(seg_tables),
        )
    else:
        track_data = load_track_data(
            track_list, regions, category_maps=init_maps
        )

    from tehmm_tpu.utils.profiling import trace

    with trace(opts.profile):
        if opts.supervised:
            labeled = read_bed_intervals(opts.trainingBed, ncol=4)
            model = MultitrackHmm.supervised(track_data, labeled)
        else:
            model = _train_unsupervised(
                opts, track_data, metrics, init_model, seg_tables
            )

    extra = None
    if opts.cfg:
        pair_names = [
            s for s in opts.pairStates.split(",") if s
        ]
        unknown = [
            n for n in pair_names if n not in model.state_names
        ]
        if unknown:
            raise SystemExit(
                f"--pairStates names not in model: {unknown} "
                f"(states: {model.state_names})"
            )
        cfg_meta = {
            "pair_states": pair_names,
            "max_span": opts.maxSpan,
        }
        if opts.saPrior is not None:
            if not 0.0 < opts.saPrior < 1.0:
                raise SystemExit(
                    f"--saPrior must be in (0, 1), got {opts.saPrior}"
                )
            cfg_meta["sa_prior"] = opts.saPrior
        if opts.matchBonus is not None:
            cfg_meta["match_bonus"] = opts.matchBonus
        elif pair_names:
            cfg_meta.update(_learn_pair_params(
                opts, model, track_data, pair_names,
                labeled if opts.supervised else None,
            ))
        else:
            cfg_meta["match_bonus"] = 0.0
        if opts.cfgEm > 0:
            if not pair_names:
                logger.info(
                    "--cfgEm with no --pairStates is plain HMM EM; "
                    "skipping (already trained)"
                )
            elif opts.segment:
                raise SystemExit(
                    "--cfgEm does not support --segment (the pair "
                    "grammar nests base-resolution ends)"
                )
            else:
                cfg_meta = _refine_cfg_em(
                    opts, model, track_data, pair_names, cfg_meta,
                    metrics,
                )
        extra = {"cfg": cfg_meta}
    # multi-host: the EM result is replicated on every process; only
    # process 0 writes the model/metrics files (shared filesystem)
    if is_proc0:
        model.save(opts.outputModel, extra=extra)
        logger.info("saved model to %s", opts.outputModel)
    metrics.close()
    return 0


def _train_unsupervised(
    opts, track_data, metrics, init_model=None, seg_tables=None
) -> MultitrackHmm:
    trans_paths = [
        p for p in (opts.initTransProbs, opts.forceTransProbs) if p
    ]
    em_paths = [p for p in (opts.initEmProbs, opts.forceEmProbs) if p]
    state_names = priors_io.collect_state_names(trans_paths, em_paths)
    n_states = max(opts.numStates, len(state_names))
    # auto-fill the remaining states with numeric names, SKIPPING any
    # number a prior file already used as a state name — a duplicate
    # would make the priors land on the wrong rows (name -> index maps
    # keep the last duplicate) and corrupt the saved name table
    used = set(state_names)
    next_i = 0
    while len(state_names) < n_states:
        if str(next_i) not in used:
            state_names.append(str(next_i))
            used.add(str(next_i))
        next_i += 1

    init = "flat" if opts.flatEm else "random"
    rand_range = tuple(float(x) for x in opts.emRandRange.split(","))
    if init_model is not None:
        model = init_model
        state_names = model.state_names
        n_states = model.num_states
        _apply_init_priors(opts, model, track_data, state_names)
    else:
        model = _init_model(
            opts, track_data, state_names, n_states, init, opts.seed,
            rand_range,
        )

    # ---- build masks ----
    masks = _build_masks(opts, model, track_data, state_names)

    mesh = None
    if opts.mesh:
        from tehmm_tpu.parallel import make_data_mesh

        mesh = make_data_mesh(opts.mesh)

    tables = seg_tables if seg_tables is not None else track_data.tables
    weights = None
    if seg_tables is not None and opts.segLen:
        weights = [t.lengths.astype("float32") for t in seg_tables]
    chunk_len = opts.chunk

    n_reps = max(1, opts.reps)
    if n_reps > 1 and (mesh is not None or opts.deviceLoop):
        # the vmapped fit_restarts program has no sharded/device-loop
        # variant yet — don't let a pod user pay R× wall-clock unaware
        logger.warning(
            "--reps %d with %s runs restarts SEQUENTIALLY (R× wall-clock): "
            "the batched one-device-program restart path does not compose "
            "with it yet.  Drop --mesh/--deviceLoop to batch restarts, or "
            "run reps as separate processes over --processId.",
            n_reps, "--mesh" if mesh is not None else "--deviceLoop",
        )
    if n_reps > 1 and mesh is None and not opts.deviceLoop:
        # batched restarts: R parameter sets, ONE vmapped device program
        # per iteration (reference --reps forks processes; --numThreads
        # is subsumed — the chip runs all restarts concurrently)
        from tehmm_tpu.models.hmm import fit_restarts

        rep_models = [model] + [
            _init_model(
                opts, track_data, state_names, n_states, "random",
                opts.seed + rep, rand_range,
            )
            for rep in range(1, n_reps)
        ]
        best_idx, results = fit_restarts(
            rep_models, tables,
            max_iterations=opts.iter,
            convergence_tol=opts.emThresh,
            masks=masks,
            chunk_len=chunk_len,
            metrics=metrics,
            obs_weight_arrays=weights,
        )
        for rep, res in enumerate(results):
            logger.info(
                "rep %d: loglik %.4f after %d iters (converged=%s)",
                rep, res.logliks[-1] if res.logliks else -np.inf,
                res.iterations, res.converged,
            )
        if opts.checkpoint:
            rep_models[best_idx].save(opts.checkpoint)
        return rep_models[best_idx]

    best = None
    for rep in range(n_reps):
        rep_model = model
        if rep > 0:
            # random restart: fresh random emissions with the user's
            # rand_range, with the SAME init priors re-applied so fix/
            # force masks pin the user's values, not random ones
            rep_model = _init_model(
                opts, track_data, state_names, n_states, "random",
                opts.seed + rep, rand_range,
            )
        result = rep_model.fit(
            tables,
            max_iterations=opts.iter,
            convergence_tol=opts.emThresh,
            masks=masks,
            chunk_len=chunk_len,
            mesh=mesh,
            metrics=metrics,
            checkpoint_path=opts.checkpoint,
            checkpoint_every=opts.checkpointEvery,
            obs_weight_arrays=weights,
            device_loop=opts.deviceLoop,
        )
        final = result.logliks[-1] if result.logliks else -np.inf
        logger.info(
            "rep %d: loglik %.4f after %d iters (converged=%s)",
            rep, final, result.iterations, result.converged,
        )
        if best is None or final > best[0]:
            best = (final, rep_model)
    return best[1]


def _refine_cfg_em(opts, model, track_data, pair_names, cfg_meta,
                   metrics) -> dict:
    """--cfgEm: inside-outside EM under the pair grammar
    (models/cfg_em.py), refining the HMM- or supervised-trained model
    in place.  The HMM init + pair weights from cfg_meta seed the run;
    the learned per-state log_match replaces them."""
    import jax.numpy as jnp

    from tehmm_tpu.models import cfg_em as cfg_em_mod
    from tehmm_tpu.models.cfg import make_cfg_params

    pair_idx = [model.state_names.index(n) for n in pair_names]
    params = make_cfg_params(
        model.params, pair_idx,
        match_bonus=cfg_meta.get("match_bonus", 0.0),
        log_match=(
            np.asarray(cfg_meta["log_match"], np.float32)
            if "log_match" in cfg_meta else None
        ),
        sa_prior=cfg_meta.get("sa_prior"),
    )
    # window tables to the chart budget (O(maxSpan²·S) memory); CFG
    # decode bounds spans the same way (models/cfg.py)
    syms, vals = [], []
    has_gauss = model.gauss is not None
    for tab in track_data.tables:
        if has_gauss and tab.values is None:
            # vals and syms are indexed in lockstep inside cfg_em_run;
            # a table missing its values would silently misalign them
            raise ValueError(
                "gaussian model but table has no values array "
                "(load_track_data must populate values for gauss tracks)"
            )
        for w0 in range(0, len(tab.symbols), opts.maxSpan):
            syms.append(np.asarray(tab.symbols[w0:w0 + opts.maxSpan]))
            if has_gauss:
                vals.append(np.asarray(
                    tab.values[w0:w0 + opts.maxSpan]
                ))
    masks = _build_masks(opts, model, track_data, model.state_names)

    def log_iter(it, ll):
        logger.info("cfg-em iter %d: inside loglik %.6f", it, ll)
        metrics.write(phase="cfg_em", iter=it, loglik=ll)

    mesh = None
    if opts.mesh:
        from tehmm_tpu.parallel import make_data_mesh

        mesh = make_data_mesh(opts.mesh)
    result, new_gauss = cfg_em_mod.cfg_em_run(
        params, syms, model.alphabet_sizes,
        iterations=opts.cfgEm, masks=masks,
        update_match=opts.matchBonus is None,
        threshold=opts.emThresh,
        gauss_params=model.gauss if has_gauss else None,
        values_list=vals if has_gauss and vals else None,
        log_fn=log_iter,
        mesh=mesh,
    )
    model.params = result.params.hmm
    if new_gauss is not None:
        model.gauss = new_gauss
    lm = np.asarray(result.params.log_match)
    logger.info(
        "cfg-em done after %d iters (converged=%s): log_match=%s",
        result.iterations, result.converged,
        {n: round(float(lm[i]), 4)
         for n, i in zip(pair_names, pair_idx)},
    )
    out = dict(cfg_meta)
    out.pop("match_bonus", None)
    out["log_match"] = [float(x) for x in lm]
    return out


def _learn_pair_params(opts, model, track_data, pair_names, labeled):
    """Learn the CFG pair parameters (reference: PairEmissionModel
    match/mismatch weighting, SURVEY.md §2a — the reference takes these
    from training; round-1 review flagged the constant-only bonus).

    Supervised: per-state log-odds bonus from counted pair-end agreement
    (models/cfg.estimate_match_bonus).  EM mode: a shared bonus fit by
    maximizing the inside log-likelihood over --maxSpan windows
    (models/cfg.fit_match_bonus)."""
    import jax.numpy as jnp

    from tehmm_tpu.models import cfg as cfg_mod
    from tehmm_tpu.models.emission import track_log_likelihoods
    from tehmm_tpu.models.hmm import label_tables

    pair_idx = [model.state_names.index(n) for n in pair_names]
    if labeled is not None:
        name_to_idx = {n: i for i, n in enumerate(model.state_names)}
        states_per_table = label_tables(
            track_data.tables, labeled, name_to_idx
        )
        log_match = cfg_mod.estimate_match_bonus(
            track_data.tables, states_per_table, pair_idx,
            np.asarray(model.params.log_em), model.num_states,
            alphabet_sizes=track_data.alphabet_sizes,
        )
        logger.info(
            "supervised pair-emission fit: log_match=%s",
            {n: round(float(log_match[i]), 4)
             for n, i in zip(pair_names, pair_idx)},
        )
        return {"log_match": [float(x) for x in log_match]}

    # EM mode: shared-bonus likelihood fit on bounded windows.  The
    # fit must run under the SAME grammar decode will use — with
    # --saPrior unapplied here the selected bonus would be calibrated
    # for an unpenalized pair rule and systematically mis-fit.
    params = cfg_mod.make_cfg_params(
        model.params, pair_idx, 0.0, sa_prior=opts.saPrior
    )
    obs_list, sym_list = [], []
    for tab in track_data.tables:
        sym = jnp.asarray(tab.symbols[: opts.maxSpan])
        obs = track_log_likelihoods(model.params.log_em, sym[None])[0]
        if model.gauss is not None and tab.values is not None:
            from tehmm_tpu.models.gauss import gauss_log_likelihoods

            obs = obs + gauss_log_likelihoods(
                model.gauss,
                jnp.asarray(tab.values[: opts.maxSpan][None]),
            )[0]
        obs_list.append(obs)
        sym_list.append(sym)
    bonus = cfg_mod.fit_match_bonus(
        params, obs_list, sym_list, opts.maxSpan
    )
    logger.info("inside-likelihood match-bonus fit: %s", bonus)
    return {"match_bonus": float(bonus)}


def _init_model(
    opts, track_data, state_names, n_states, init, seed, rand_range
) -> MultitrackHmm:
    """Fresh model + init priors, shared by rep 0 and random restarts."""
    if opts.initEmProbs:
        # grow the category maps from the prior file FIRST so the fresh
        # emission init normalizes over the final alphabet (the padding
        # path in _apply_init_priors is then only for --initModel resume)
        priors_io.read_em_prior(
            opts.initEmProbs, state_names, track_data.track_list,
            track_data.category_maps,
        )
    model = MultitrackHmm.initialized(
        n_states, track_data, init=init, seed=seed,
        rand_range=rand_range, state_names=state_names,
    )
    if track_data.gauss_track_indices:
        from tehmm_tpu.models.gauss import init_gauss

        model.gauss = init_gauss(
            n_states,
            [t.values for t in track_data.tables],
            seed=seed,
        )
    _apply_init_priors(opts, model, track_data, state_names)
    return model


def _apply_init_priors(opts, model, track_data, state_names) -> None:
    """Apply --initTransProbs / --initEmProbs onto an existing model
    IN PLACE, preserving whatever parameters are not named by the prior
    files (reference: hmm.py applyUserTrans/applyUserEmission — priors
    overlay the current init, they do not reset it)."""
    if opts.initTransProbs:
        prior = priors_io.read_trans_prior(
            opts.initTransProbs, state_names
        )
        trans = priors_io.prior_to_init(prior)
        model.params = HmmParams(
            log_start=model.params.log_start,
            log_trans=jnp.asarray(
                np.log(np.maximum(trans, 1e-300)), jnp.float32
            ),
            log_em=model.params.log_em,
        )
    if opts.initEmProbs:
        prior = priors_io.read_em_prior(
            opts.initEmProbs, state_names, track_data.track_list,
            track_data.category_maps,
        )
        # keep the CURRENT emissions (and transitions/start untouched),
        # padding the symbol axis if the prior file grew an alphabet;
        # specified entries overwrite and the remaining REAL symbols
        # renormalize to the leftover mass (same semantics as
        # --forceEmProbs; reference: applyUserEmission init handling)
        sizes = track_data.alphabet_sizes
        log_em = np.array(model.params.log_em)  # mutable copy
        if log_em.shape[2] < prior.shape[2]:
            # the prior file grew an alphabet: the new symbol was never
            # seen by the states the file does NOT name, so their new
            # column must carry ~zero probability.  (Padding with 0.0 —
            # log-prob 1 — silently handed every unnamed state a
            # phantom unit of mass that _apply_force_em then treated
            # as real, corrupting its trained distribution.)
            from tehmm_tpu.utils.common import LOG_ZERO

            pad = prior.shape[2] - log_em.shape[2]
            log_em = np.pad(
                log_em, ((0, 0), (0, 0), (0, pad)),
                constant_values=LOG_ZERO,
            )
        log_em = np.asarray(em_ops._apply_force_em(
            jnp.asarray(apply_emission_conventions(log_em, sizes)),
            jnp.asarray(prior[:, :, : log_em.shape[2]]),
            jnp.asarray(sizes),
        ))
        model.params = HmmParams(
            log_start=model.params.log_start,
            log_trans=model.params.log_trans,
            log_em=jnp.asarray(log_em),
        )


def _check_force_mass(table: "np.ndarray", path: str) -> None:
    """Forced probabilities in any row must not exceed 1: the M-step's
    renormalization scale for the free entries would go negative and
    silently clamp every free probability to ~0, training on a
    non-stochastic table with no signal anything is wrong."""
    t = np.asarray(table)
    forced = np.where(t >= 0.0, t, 0.0)
    mass = forced.sum(axis=-1)
    if (mass > 1.0 + 1e-4).any():
        raise SystemExit(
            f"{path}: forced probabilities sum to "
            f"{float(mass.max()):.4f} > 1 in at least one row"
        )


def _build_masks(opts, model, track_data, state_names):
    fix_trans = force_trans = fix_em = force_em = None
    S = model.num_states
    if opts.fixTrans:
        fix_trans = jnp.ones((S,), dtype=bool)
    if opts.fixEm:
        fix_em = jnp.ones((S,), dtype=bool)
    if opts.forceTransProbs:
        ft = priors_io.read_trans_prior(
            opts.forceTransProbs, state_names
        )
        _check_force_mass(ft, opts.forceTransProbs)
        force_trans = jnp.asarray(ft)
    if opts.forceEmProbs:
        prior = priors_io.read_em_prior(
            opts.forceEmProbs, state_names, track_data.track_list,
            track_data.category_maps, update_maps=False,
        )
        _check_force_mass(prior, opts.forceEmProbs)
        V = model.params.max_symbols
        if prior.shape[2] < V:
            prior = np.pad(
                prior, ((0, 0), (0, 0), (0, V - prior.shape[2])),
                constant_values=-1.0,
            )
        force_em = jnp.asarray(prior[:, :, :V])
    if any(
        x is not None for x in (fix_trans, force_trans, fix_em, force_em)
    ):
        return em_ops.ParamMasks(
            fix_trans_rows=fix_trans,
            fix_em_states=fix_em,
            force_trans=force_trans,
            force_em=force_em,
        )
    return None


if __name__ == "__main__":
    sys.exit(main())
