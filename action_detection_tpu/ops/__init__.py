from .iou import (
    temporal_iou,
    temporal_iou_matrix,
    overlap_over_b,
    temporal_recall,
    name_proposal,
    get_temporal_proposal_recall,
)
from .nms import temporal_nms, temporal_nms_indices
from .stpp import (
    parse_stage_config,
    StppConfig,
    stpp_pool_matrix,
    stpp_train_pool,
    reorganized_score_slices,
    reorganized_stpp_pool,
)
from .losses import (
    ohem_hinge_loss,
    completeness_loss,
    classwise_regression_loss,
    activity_cross_entropy,
)
