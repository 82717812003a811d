from tehmm_tpu.ops.dp import (
    forward,
    backward,
    viterbi,
    posterior,
)

__all__ = ["forward", "backward", "viterbi", "posterior"]
