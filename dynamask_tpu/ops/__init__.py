from .roi_align import (roi_align, multilevel_roi_align, simple_roi_align,
                        map_roi_levels)
from .nms import nms, batched_nms, multiclass_nms
from .paste import paste_masks

__all__ = [
    'roi_align', 'multilevel_roi_align', 'simple_roi_align', 'map_roi_levels',
    'nms', 'batched_nms', 'multiclass_nms', 'paste_masks',
]
