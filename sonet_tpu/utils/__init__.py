"""Observability utilities (lazy exports).

PEP 562 lazy loading (same pattern as the package root): importing this
package must NOT pull in jax — ``sonet monitor`` (tasks/monitor.py ->
utils.dashboard) is a stdlib-only daemon meant to run on any machine
that sees the run dir, and ``utils.profiling`` imports jax at module
scope (ADVICE r2)."""

_EXPORTS = {
    "MetricLogger": ".logging",
    "StepTimer": ".logging",
    "trace": ".profiling",
    "enable_nan_checks": ".profiling",
    "diagnose_grads": ".profiling",
    "scan_bench": ".profiling",
    "device_time": ".tprof",
    "HTMLGallery": ".visualize",
    "load_part_colors": ".visualize",
    "save_point_cloud_png": ".visualize",
    "save_seg_comparison": ".visualize",
}

__all__ = list(_EXPORTS)


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod, __name__), name)


def __dir__():
    return sorted(__all__)
