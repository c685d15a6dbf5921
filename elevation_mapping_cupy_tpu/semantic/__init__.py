from . import fusions, update  # noqa: F401
