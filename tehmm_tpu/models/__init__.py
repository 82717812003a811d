from tehmm_tpu.models.params import HmmParams, init_flat, init_random
from tehmm_tpu.models.emission import (
    track_log_likelihoods,
    normalize_log_em,
)

__all__ = [
    "HmmParams",
    "init_flat",
    "init_random",
    "track_log_likelihoods",
    "normalize_log_em",
]
