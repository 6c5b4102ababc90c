from image_search_tpu.utils.metrics import Metrics, global_metrics
from image_search_tpu.utils.profiling import StageTimer, maybe_start_profiler

__all__ = ["Metrics", "global_metrics", "StageTimer", "maybe_start_profiler"]
