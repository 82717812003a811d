"""Real-TPU test tier (VERDICT round-1 item #8).

Unlike tests/ (which forces an 8-device virtual CPU mesh and runs the
Pallas kernels in interpret mode), this tier runs the kernels through
the REAL Mosaic compiler on the bench chip — catching quantization and
VMEM regressions that interpreter CI cannot.

Run on a TPU host:

    PYTHONPATH=/root/repo:/root/.axon_site python -m pytest tests_tpu/ -q

Skips itself cleanly when no TPU backend is available.
"""

import numpy as np
import pytest

import jax


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="no TPU backend")
        for item in items:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
