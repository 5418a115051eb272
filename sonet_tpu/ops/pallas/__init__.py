"""Pallas TPU kernels for the hot ops (SURVEY.md §7 step 5).

Each kernel has a pure-XLA sibling in ``sonet_tpu.ops`` used as the
cross-check oracle (plus a C++ reference in ``sonet_tpu/native``)."""

from .segment_argmax import segment_argmax, segment_max_pallas

__all__ = ["segment_argmax", "segment_max_pallas"]
