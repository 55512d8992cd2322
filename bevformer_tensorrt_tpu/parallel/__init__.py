from .mesh import make_mesh, pick_dp_tp, replicated, batch_sharding  # noqa: F401
from .sharding import param_shardings, spec_for_path, DEFAULT_RULES  # noqa: F401
from .pipeline import (  # noqa: F401
    pipeline_apply,
    stack_stage_params,
    stage_param_sharding,
)
