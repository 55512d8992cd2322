from .assigner import hungarian_assign  # noqa: F401
from .losses import (  # noqa: F401
    normalize_bbox,
    sigmoid_focal_loss,
    focal_cls_cost,
    bbox_l1_cost,
)
from .step import (  # noqa: F401
    bevformer_detr_loss,
    make_optimizer,
    make_train_step,
    make_temporal_train_step,
    init_train_state,
)
