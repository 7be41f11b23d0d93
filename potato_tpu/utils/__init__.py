from potato_tpu.utils.metrics import MetricsLogger, null_metrics  # noqa: F401
