"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 5).

Each kernel has a pure-XLA sibling in ``sonet_tpu.ops`` used as the
cross-check oracle (plus a C++ reference in ``sonet_tpu/native``).
Measured status at SO-Net shapes (B=8, kN=15000, M=64, C=384) on v5e:
the production ``ops.segment_max`` (scatter fwd 2.2ms + matmul-routed
custom VJP 1.5ms) beats both kernels end to end; they are kept for
reference parity (argmax semantics) and as independent oracles.
"""

from .segment_argmax import segment_argmax, segment_max_pallas
from .segment_max_window import segment_max_windowed

__all__ = ["segment_argmax", "segment_max_pallas", "segment_max_windowed"]
