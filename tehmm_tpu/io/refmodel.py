"""Best-effort import of reference teHmm model pickles (.mdl).

The reference persists models as a pickle of the whole ``MultitrackHmm``
object (reference: modelIO.py saveModel/loadModel [R]; SURVEY.md §2a
modelIO row).  Unpickling normally requires the teHmm classes; this
module loads such pickles WITHOUT them via a tolerant unpickler that
substitutes attribute-capturing stubs for every unimportable class,
then mines the object graph for the quantities this framework needs:

  start / transition probabilities  (sklearn-hmm style ``startprob_`` /
                                    ``transmat_`` [R], prob OR log space)
  emission tables                   (``logProbs`` [S][T][V], dense or
                                    ragged per track [R])
  state names                       (``stateNameMap`` [R?])
  track names + category maps       (``trackList`` / per-track
                                    ``catMap`` [R?])

Every extraction is heuristic against [R]-grade attribute names (the
reference mount was empty at survey time — SURVEY.md provenance
notice); the converter reports exactly which pieces were found and
which were defaulted, and refuses to write a model unless all three
probability tables were recovered.  Re-verify the attribute names
against the real reference when /root/reference is populated
(tools/verify_reference.py).
"""

from __future__ import annotations

import io
import pickle
from typing import Any

import numpy as np

from tehmm_tpu.utils.common import LOG_ZERO, logger


class StubObject:
    """Attribute-capturing placeholder for an unimportable class."""

    _ref_class = "?"

    def __init__(self, *args, **kwargs):
        self._stub_args = args
        self._stub_kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif (
            isinstance(state, tuple) and len(state) == 2
            and isinstance(state[0], (dict, type(None)))
        ):
            # (dict_state, slots_state) protocol-2 form
            if state[0]:
                self.__dict__.update(state[0])
            if isinstance(state[1], dict):
                self.__dict__.update(state[1])
        else:
            self._stub_state = state

    def __repr__(self):
        return f"<stub {self._ref_class}>"


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            return super().find_class(module, name)
        except Exception:
            return type(
                name, (StubObject,),
                {"_ref_class": f"{module}.{name}"},
            )


def tolerant_load(path: str) -> Any:
    """Unpickle ``path`` with stub substitution for missing classes.
    ``encoding='latin1'`` handles the reference's py2-era pickles."""
    with open(path, "rb") as fh:
        data = fh.read()
    return _TolerantUnpickler(io.BytesIO(data), encoding="latin1").load()


# ---------------------------------------------------------------------------
# object-graph mining
# ---------------------------------------------------------------------------

def _walk(obj, seen=None):
    """Yield every object reachable through stub attributes, dicts,
    lists and tuples (numpy arrays are leaves)."""
    if seen is None:
        seen = set()
    if id(obj) in seen:
        return
    seen.add(id(obj))
    yield obj
    if isinstance(obj, StubObject):
        for v in vars(obj).values():
            yield from _walk(v, seen)
    elif isinstance(obj, dict):
        for v in obj.values():
            yield from _walk(v, seen)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            yield from _walk(v, seen)


def _named_attrs(root):
    """(lowercased attribute name, value) pairs across the graph."""
    for node in _walk(root):
        if isinstance(node, StubObject):
            for k, v in vars(node).items():
                yield k.lower(), v, node


def _as_prob_matrix(v, want_rows=None):
    """Validate/convert a candidate start/transition table to LOG
    space.  Accepts prob-space (rows ~sum to 1) or log-space (<= 0)
    float arrays; returns None if it is neither."""
    try:
        a = np.asarray(v, np.float64)
    except Exception:
        return None
    if a.ndim not in (1, 2) or a.size == 0:
        return None
    if not np.isfinite(a).all():
        if np.nanmax(a) <= 0:        # log space with -inf entries
            return np.where(np.isfinite(a), a, LOG_ZERO)
        return None
    if want_rows is not None and a.shape[0] != want_rows:
        return None
    rows = a if a.ndim == 2 else a[None, :]
    if a.max() <= 0 and a.min() < -1e-9:
        return a                     # already log space
    sums = rows.sum(axis=-1)
    if np.allclose(sums, 1.0, atol=1e-3):
        with np.errstate(divide="ignore"):
            out = np.log(a)
        return np.where(np.isfinite(out), out, LOG_ZERO)
    return None


_START_NAMES = ("startprob_", "startprob", "start_prob", "logstartprob",
                "log_startprob")
_TRANS_NAMES = ("transmat_", "transmat", "trans_mat", "logtransmat",
                "log_transmat")
_EM_NAMES = ("logprobs", "log_probs", "emissionlogprobs", "emprobs")
_STATE_NAME_NAMES = ("statenamemap", "statenames", "state_names")
_TRACK_NAME_NAMES = ("name", "trackname")
_CATMAP_NAMES = ("catmap", "cat_map", "categorymap")


def _extract_emission(v):
    """[S][T][V] log table from a dense ndarray or nested lists of
    per-track arrays (ragged V padded with LOG_ZERO)."""
    a = None
    if isinstance(v, np.ndarray) and v.ndim == 3:
        a = np.asarray(v, np.float64)
    elif isinstance(v, (list, tuple)) and v:
        try:
            rows = []
            for per_state in v:
                tracks = [np.asarray(t, np.float64).ravel()
                          for t in per_state]
                rows.append(tracks)
        except Exception:
            return None
        S = len(rows)
        T = len(rows[0])
        if any(len(r) != T for r in rows):
            return None
        Vmax = max(len(t) for r in rows for t in r)
        a = np.full((S, T, Vmax), LOG_ZERO, np.float64)
        for s, r in enumerate(rows):
            for t, arr in enumerate(r):
                a[s, t, : len(arr)] = arr
    if a is None:
        return None
    finite = a[np.isfinite(a)]
    if finite.size == 0:
        return None
    if finite.min() >= 0 and finite.max() <= 1 + 1e-9:   # prob space
        with np.errstate(divide="ignore"):
            a = np.log(a)
    elif finite.max() > 1e-9:
        return None                   # neither prob nor log space
    return np.where(np.isfinite(a), a, LOG_ZERO)


def _extract_name_map(v, size=None):
    """A {name: index} dict (possibly behind a CategoryMap-style stub)
    covering exactly [0, size) -> ordered name list, else None."""
    cand = None
    if isinstance(v, dict):
        cand = v
    elif isinstance(v, StubObject):
        for k, vv in vars(v).items():
            if isinstance(vv, dict) and vv:
                cand = vv
                break
    if not cand:
        return None
    try:
        pairs = sorted(
            ((int(i), str(n)) for n, i in cand.items()),
            key=lambda p: p[0],
        )
    except Exception:
        try:
            # inverted orientation: {index: name}
            pairs = sorted(
                ((int(i), str(n)) for i, n in cand.items()),
                key=lambda p: p[0],
            )
        except Exception:
            return None
    idxs = [p[0] for p in pairs]
    lo = min(idxs)
    if lo not in (0, 1):
        return None
    names = [p[1] for p in pairs]
    if size is not None and len(names) != size:
        return None
    return names


def extract_reference_model(root) -> dict:
    """Mine a tolerantly-unpickled reference model object.

    Returns a report dict: keys ``log_start``/``log_trans``/``log_em``
    (None when not found), ``state_names``, ``track_names``,
    ``category_maps`` ({track name: {value: symbol}}), and ``found`` /
    ``defaulted`` name lists describing what was recovered."""
    out = {
        "log_start": None, "log_trans": None, "log_em": None,
        "state_names": None, "track_names": None,
        "category_maps": {},
        "found": [], "defaulted": [],
    }
    attrs = list(_named_attrs(root))

    for key, v, _node in attrs:
        if out["log_em"] is None and key in _EM_NAMES:
            em = _extract_emission(v)
            if em is not None:
                out["log_em"] = em
                out["found"].append(f"emission table <- {key}")
    S = None if out["log_em"] is None else out["log_em"].shape[0]

    for key, v, _node in attrs:
        if out["log_trans"] is None and key in _TRANS_NAMES:
            m = _as_prob_matrix(v, want_rows=S)
            if m is not None and m.ndim == 2 and m.shape[0] == m.shape[1]:
                out["log_trans"] = m
                out["found"].append(f"transitions <- {key}")
        if out["log_start"] is None and key in _START_NAMES:
            m = _as_prob_matrix(v)
            if m is not None and m.ndim == 1 and (
                S is None or m.shape[0] == S
            ):
                out["log_start"] = m
                out["found"].append(f"start probs <- {key}")

    if S is None and out["log_trans"] is not None:
        S = out["log_trans"].shape[0]

    for key, v, _node in attrs:
        if out["state_names"] is None and key in _STATE_NAME_NAMES:
            names = _extract_name_map(v, size=S)
            if names is None and isinstance(v, (list, tuple)) and (
                S is None or len(v) == S
            ):
                names = [str(x) for x in v]
            if names is not None:
                out["state_names"] = names
                out["found"].append(f"state names <- {key}")

    # track stubs: anything with a string `name` and a catMap-ish attr
    track_names: list[str] = []
    for key, v, node in attrs:
        if key in _CATMAP_NAMES:
            tname = None
            for nk in _TRACK_NAME_NAMES:
                cand = vars(node).get(nk)
                if isinstance(cand, str):
                    tname = cand
                    break
            cm = None
            if isinstance(v, dict):
                cm = v
            elif isinstance(v, StubObject):
                for vv in vars(v).values():
                    if isinstance(vv, dict) and vv and all(
                        isinstance(x, int) for x in vv.values()
                    ):
                        cm = vv
                        break
            if tname is not None and cm is not None:
                track_names.append(tname)
                out["category_maps"][tname] = {
                    str(k): int(i) for k, i in cm.items()
                }
                out["found"].append(f"category map <- track {tname!r}")
    if track_names:
        out["track_names"] = track_names
    return out


def convert_reference_model(in_path: str, out_path: str) -> dict:
    """Convert a reference .mdl pickle into this framework's .npz model.

    Best-effort: requires the three probability tables; state names,
    track names and category maps default (with a logged warning) when
    unrecoverable.  Returns the extraction report."""
    from tehmm_tpu.io.category import CategoryMap
    from tehmm_tpu.io.trackxml import Track, TrackList
    from tehmm_tpu.models.hmm import MultitrackHmm
    from tehmm_tpu.models.params import HmmParams

    import jax.numpy as jnp

    root = tolerant_load(in_path)
    rep = extract_reference_model(root)
    missing = [
        k for k in ("log_start", "log_trans", "log_em")
        if rep[k] is None
    ]
    if missing:
        raise ValueError(
            f"could not recover {', '.join(missing)} from {in_path!r}; "
            f"found: {rep['found'] or 'nothing'} — the reference's "
            f"attribute layout differs from the [R] reconstruction "
            f"(SURVEY.md §2a modelIO row); extend io/refmodel.py with "
            f"the real names"
        )
    S, T, _V = rep["log_em"].shape
    params = HmmParams(
        log_start=jnp.asarray(rep["log_start"], jnp.float32),
        log_trans=jnp.asarray(rep["log_trans"], jnp.float32),
        log_em=jnp.asarray(rep["log_em"], jnp.float32),
    )
    state_names = rep["state_names"]
    if state_names is None:
        state_names = [str(i) for i in range(S)]
        rep["defaulted"].append("state names")
    track_names = rep["track_names"]
    if track_names is None or len(track_names) != T:
        track_names = [f"track{t}" for t in range(T)]
        rep["defaulted"].append("track names")
    track_list = TrackList()
    maps = {}
    for t, name in enumerate(track_names):
        track_list.add(Track(name=name, path=name + ".bed"))
        cm_dict = rep["category_maps"].get(name)
        if cm_dict:
            reserved = 1 if min(cm_dict.values()) >= 1 else 0
            maps[name] = CategoryMap.from_dict(
                {"reserved": reserved, "map": cm_dict}
            )
        else:
            # identity map over the emission alphabet (symbol 0 stays
            # reserved for missing)
            cm = CategoryMap()
            V = params.log_em.shape[2]
            for v in range(1, V):
                cm.get_map(str(v), update=True)
            maps[name] = cm
            rep["defaulted"].append(f"category map for {name!r}")
    if rep["defaulted"]:
        logger.warning(
            "reference model import: defaulted %s — decode output is "
            "usable but symbol/name fidelity needs the real reference "
            "layout", ", ".join(rep["defaulted"]),
        )
    model = MultitrackHmm(params, track_list, maps, state_names)
    model.extra["imported_from"] = in_path
    model.save(out_path)
    return rep
