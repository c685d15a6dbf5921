from .mesh import make_mesh  # noqa: F401
from .batch import init_batch, batched_update, batched_move_to, batched_input_image, shard_states, batch_stats  # noqa: F401
from . import halo  # noqa: F401
from . import distributed  # noqa: F401
from . import spatial  # noqa: F401
from . import checkpoint  # noqa: F401
