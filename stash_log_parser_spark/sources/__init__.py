from .catalog import SinkCatalog  # noqa: F401
