from .traversability import TravWeights, traversability_filter, default_weights, load_weights_npz  # noqa: F401
