"""JAX platform/compile-cache setup for CLI entry points.

Two quality-of-life knobs the reference never needed (pure NumPy) but a
compiled-accelerator framework does:

* ``TEHMM_PLATFORM`` env var (or the ``platform`` argument): force the
  JAX backend, e.g. ``cpu`` for host-only runs.  Needed because some TPU
  plugins force-register themselves and ignore ``JAX_PLATFORMS``.
* Persistent XLA compilation cache (default ``~/.cache/tehmm_tpu/xla``,
  disable with ``TEHMM_COMPILE_CACHE=0``): CLI tools are separate
  processes, and TPU compiles of the scan kernels take tens of seconds —
  the cache makes every invocation after the first start instantly.
* ``TEHMM_DEBUG_NANS=1``: dev-mode NaN guard (SURVEY.md §5 race-detection
  row) — flips ``jax_debug_nans`` so the first NaN-producing op raises
  with its location instead of silently corrupting downstream scans.
  Development only: it forces per-op sync checks and disqualifies some
  fusions.

Must run before any JAX backend is initialized (CLI mains call it first).
"""

from __future__ import annotations

import os


def setup_jax(platform: str | None = None,
              cache_dir: str | None = None) -> None:
    import jax

    platform = platform or os.environ.get("TEHMM_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    if os.environ.get("TEHMM_DEBUG_NANS", "").lower() in (
        "1", "on", "true", "yes"
    ):
        jax.config.update("jax_debug_nans", True)

    cache = cache_dir or os.environ.get(
        "TEHMM_COMPILE_CACHE", "~/.cache/tehmm_tpu/xla"
    )
    if cache and cache != "0":
        # key the cache by a host-CPU fingerprint: XLA:CPU AOT entries
        # record the compile machine's feature set, and a home directory
        # shared across heterogeneous hosts otherwise serves stale AOT
        # results ("Target machine feature ... not supported on the host
        # machine ... could lead to execution errors such as SIGILL")
        import hashlib
        import platform as _plat

        fp = hashlib.sha1(
            f"{_plat.machine()}:{_cpu_flags_fingerprint()}".encode()
        ).hexdigest()[:12]
        path = os.path.join(os.path.expanduser(cache), fp)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )


def _cpu_flags_fingerprint() -> str:
    """The host CPU's feature flags (Linux) — distinguishes hosts whose
    XLA:CPU AOT artifacts are mutually incompatible."""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return " ".join(sorted(line.split(":", 1)[1].split()))
    except OSError:
        pass
    return "unknown"
