from .logging import MetricLogger, StepTimer
from .profiling import trace, enable_nan_checks, diagnose_grads, scan_bench
from .tprof import device_time
from .visualize import (HTMLGallery, load_part_colors, save_point_cloud_png,
                        save_seg_comparison)

__all__ = ["MetricLogger", "StepTimer", "trace", "enable_nan_checks",
           "diagnose_grads", "scan_bench", "device_time", "HTMLGallery",
           "load_part_colors", "save_point_cloud_png",
           "save_seg_comparison"]
