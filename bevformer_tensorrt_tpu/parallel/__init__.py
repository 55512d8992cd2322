from .mesh import make_mesh, pick_dp_tp, replicated, batch_sharding  # noqa: F401
from .sharding import param_shardings, spec_for_path, DEFAULT_RULES  # noqa: F401
