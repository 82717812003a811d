"""utils/transfer fast_device_put: scrambled staging round-trips
bit-exact (round-5; the axon tunnel's H2D codec is ~12x slower for
compressible payloads, so genome staging XOR-scrambles through it)."""

import numpy as np
import pytest

import tehmm_tpu.utils.transfer as tr


@pytest.fixture
def forced_on(monkeypatch):
    monkeypatch.setenv("TEHMM_H2D_SCRAMBLE", "on")
    tr.scramble_enabled.cache_clear()
    yield
    tr.scramble_enabled.cache_clear()


@pytest.fixture
def small_threshold(monkeypatch):
    # exercise the scramble path without 64 MB fixtures
    monkeypatch.setattr(tr, "_MIN_BYTES", 1024)


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((1 << 20,), np.uint8),          # aligned 1 MB
        ((999_983,), np.uint8),          # prime length: unaligned tail
        ((4096, 257), np.uint8),         # 2-D, odd inner
        ((250_007,), np.float32),        # bitcast path
        ((1 << 16, 3), np.int32),
    ],
)
def test_round_trip(forced_on, small_threshold, shape, dtype):
    rng = np.random.RandomState(0)
    if np.issubdtype(dtype, np.floating):
        arr = rng.randn(*shape).astype(dtype)
    else:
        arr = rng.randint(0, 6, size=shape).astype(dtype)
    out = np.asarray(tr.fast_device_put(arr))
    np.testing.assert_array_equal(out, arr)


def test_runlength_payload_round_trip(forced_on, small_threshold):
    """The actual workload shape: run-length symbol matrices."""
    rng = np.random.RandomState(1)
    runs = rng.randint(0, 5, size=5000).astype(np.uint8)
    arr = np.repeat(runs, 500)[: 2_000_000].reshape(-1, 8)
    out = np.asarray(tr.fast_device_put(arr))
    np.testing.assert_array_equal(out, arr)


def test_mask_phase_across_threads(forced_on, monkeypatch):
    """Slab boundaries must preserve the mask tiling phase — force
    multiple thread slabs with a tiny mask period."""
    monkeypatch.setattr(tr, "_MIN_BYTES", 1024)
    monkeypatch.setattr(tr, "_MASK_BYTES", 4096)
    tr._host_mask.cache_clear()
    tr._device_mask.cache_clear()
    try:
        rng = np.random.RandomState(2)
        arr = rng.randint(0, 256, size=64 * 4096 + 13).astype(np.uint8)
        out = np.asarray(tr.fast_device_put(arr))
        np.testing.assert_array_equal(out, arr)
    finally:
        tr._host_mask.cache_clear()
        tr._device_mask.cache_clear()


def test_disabled_is_plain_put():
    tr.scramble_enabled.cache_clear()
    try:
        arr = np.arange(100, dtype=np.int32)
        out = np.asarray(tr.fast_device_put(arr))
        np.testing.assert_array_equal(out, arr)
    finally:
        tr.scramble_enabled.cache_clear()
