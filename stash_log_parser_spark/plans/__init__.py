from .routing import SINKS, run_pipeline  # noqa: F401
