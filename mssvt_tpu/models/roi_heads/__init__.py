from .roi_head_template import (
    assign_proposal_targets,
    proposal_layer,
    roi_box_loss,
    roi_cls_loss,
)

__all__ = [
    "proposal_layer",
    "assign_proposal_targets",
    "roi_box_loss",
    "roi_cls_loss",
]
