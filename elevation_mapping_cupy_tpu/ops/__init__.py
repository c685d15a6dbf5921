from . import geometry, pointcloud, raycast, scatter, stencil  # noqa: F401
