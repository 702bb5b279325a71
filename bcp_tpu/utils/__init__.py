from bcp_tpu.utils.logging import (setup_logging, MetricWriter,
                                   enable_compile_cache)

__all__ = ["setup_logging", "MetricWriter", "enable_compile_cache"]
