from bcp_tpu.utils.logging import setup_logging, MetricWriter

__all__ = ["setup_logging", "MetricWriter"]
