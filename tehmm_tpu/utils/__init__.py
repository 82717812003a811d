from tehmm_tpu.utils.common import (
    EPSILON,
    LOG_ZERO,
    add_logging_options,
    set_logging_from_options,
    logger,
)

__all__ = [
    "EPSILON",
    "LOG_ZERO",
    "add_logging_options",
    "set_logging_from_options",
    "logger",
]
