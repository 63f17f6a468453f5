from .mesh import make_mesh  # noqa: F401
from .shard import param_shardings, shard_params  # noqa: F401
