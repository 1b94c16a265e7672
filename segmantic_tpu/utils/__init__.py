from . import config, schema, file_iterators
from .json import PathEncoder

__all__ = ["config", "schema", "file_iterators", "PathEncoder"]
