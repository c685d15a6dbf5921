from . import datagen  # noqa: F401
