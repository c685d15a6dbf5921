from .manager import PluginBase, PluginManager, PluginParams  # noqa: F401
from . import builtin  # noqa: F401
