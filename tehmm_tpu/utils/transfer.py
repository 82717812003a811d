"""Anti-compression H2D staging — a MEASURED NEGATIVE kept opt-in.

Hypothesis (round-5): the axon tunnel compresses H2D traffic and its
codec throttles COMPRESSIBLE payloads — an initial back-to-back
session measured zeros at 0.09 GB/s vs random bytes at 1.13 GB/s, a
12x gap that would make run-length genome symbol matrices worst-case
inputs.  ``fast_device_put`` was built to defeat that codec: XOR-
scramble with a tiled 64 MB pseudo-random mask on the host (threaded
single-pass ~1.9 s/GB), upload the now-incompressible bytes, XOR-
restore on device (~0.2 s/GB HBM traffic; the restore returns the
FLAT vector and reshapes eagerly — see _unscramble_flat's layout
note).

Verdict: the controlled experiment REFUTED the hypothesis.  An
interleaved A/B/A/B at 512 MB (4 reps each) measured random bytes at
median 0.80 GB/s vs run-length symbols at 0.65 GB/s, with per-
transfer rates swinging 0.10-1.14 GB/s for BOTH payloads — the
tunnel's H2D rate is dominated by time-varying congestion, not
payload entropy, and the initial 12x was a warmup/congestion
artifact.  Scrambling therefore buys nothing reproducible and costs
~2 s/GB of host work, so it is DISABLED unless explicitly requested
(``TEHMM_H2D_SCRAMBLE=on``); the default and ``auto`` are plain
``jax.device_put``.  The code stays as the executable record (same
policy as the CFG window-packing and lane-packing negatives,
BASELINE.md) and as the ready fix should a future runtime actually
ship an entropy-sensitive transport.

Reference analog: none — runtime plumbing below anything the
reference models (its NumPy arrays never leave host RAM, SURVEY.md
§3.1).
"""

from __future__ import annotations

import functools
import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

_MASK_BYTES = 64 << 20
_MASK_SEED = 0xC0FFEE
_MIN_BYTES = 64 << 20     # smaller payloads: latency, not codec, bound
_XOR_THREADS = max(1, (os.cpu_count() or 4))


@functools.lru_cache(maxsize=1)
def _host_mask() -> np.ndarray:
    return np.random.RandomState(_MASK_SEED).randint(
        0, 256, _MASK_BYTES
    ).astype(np.uint8)


@functools.lru_cache(maxsize=1)
def _device_mask():
    return jax.device_put(_host_mask())


@functools.lru_cache(maxsize=1)
def scramble_enabled() -> bool:
    """Opt-in only: the interleaved A/B experiment showed no
    reproducible payload-entropy effect on this tunnel (module
    docstring), so 'auto' means OFF."""
    return os.environ.get(
        "TEHMM_H2D_SCRAMBLE", "auto"
    ).lower() in ("1", "on", "true")


def _xor_tiled(dst_u8: np.ndarray, src_u8: np.ndarray) -> None:
    """dst = src ^ tiled-mask, single pass, threaded.  Views the
    aligned body as uint64 (numpy's uint8 XOR loop is ~4x slower);
    slab boundaries stay multiples of the mask period so the tiling
    phase is identical in every thread."""
    n = len(src_u8)
    mask = _host_mask()
    m = _MASK_BYTES
    body = (n // 8) * 8
    mask64 = mask.view(np.uint64)

    def slab(lo, hi):
        d = src_u8[lo:hi].view(np.uint64)
        o = dst_u8[lo:hi].view(np.uint64)
        k = len(d)
        m64 = m // 8
        for i in range(0, k, m64):
            l = min(m64, k - i)
            np.bitwise_xor(d[i : i + l], mask64[:l], out=o[i : i + l])

    n_threads = min(_XOR_THREADS, max(1, body // m))
    step = -(-body // n_threads)
    step = -(-step // m) * m          # slab = whole mask periods
    if n_threads <= 1 or step >= body:
        slab(0, body)
    else:
        with ThreadPoolExecutor(n_threads) as ex:
            list(ex.map(
                lambda lo: slab(lo, min(lo + step, body)),
                range(0, body, step),
            ))
    if body < n:                       # unaligned tail, plain uint8
        tail_mask = mask[body % m : body % m + (n - body)]
        np.bitwise_xor(
            src_u8[body:], tail_mask, out=dst_u8[body:]
        )


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def _unscramble_flat(dev_u8, mask_dev, *, dtype_name):
    """XOR-restore and bitcast, returning the FLAT element vector.
    The final reshape happens eagerly in fast_device_put: inside this
    jit XLA assigned the N-D output a minor-dims-last tiled layout
    that pads a small trailing dim (e.g. T=15 tracks) up to the 128
    lane width — 8.5x the memory, a 32 GB allocation for a 3.75 GB
    genome batch — whereas the standalone reshape picks the compact
    small-dim-major layout device_put uses."""
    n = dev_u8.shape[0]
    m = mask_dev.shape[0]
    reps = -(-n // m)
    x = jnp.pad(dev_u8, (0, reps * m - n))
    x = (x.reshape(reps, m) ^ mask_dev[None, :]).reshape(-1)[:n]
    dtype = jnp.dtype(dtype_name)
    if dtype.itemsize > 1:
        x = jax.lax.bitcast_convert_type(
            x.reshape(-1, dtype.itemsize), dtype
        )
    elif dtype != x.dtype:
        x = jax.lax.bitcast_convert_type(x, dtype)
    return x


def fast_device_put(arr) -> jax.Array:
    """``jax.device_put`` that takes the tunnel codec's fast path for
    large compressible payloads (module docstring).  Identity-equal to
    a plain put; async like one (the returned array is in flight)."""
    arr = np.asarray(arr)
    if (
        not scramble_enabled()
        or arr.nbytes < _MIN_BYTES
        or arr.dtype.hasobject
    ):
        return jax.device_put(arr)
    flat = np.ascontiguousarray(arr).reshape(-1).view(np.uint8)
    scrambled = np.empty_like(flat)
    _xor_tiled(scrambled, flat)
    dev = jax.device_put(scrambled)
    out = _unscramble_flat(
        dev, _device_mask(), dtype_name=arr.dtype.name
    )
    return out.reshape(arr.shape)
