from repmode_tpu.metrics.metrics import metric_stats, metric_stats_device
from repmode_tpu.metrics.aggregate import MetricAggregator

__all__ = ["metric_stats", "metric_stats_device", "MetricAggregator"]
