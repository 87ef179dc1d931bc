from .roi_align import (roi_align, multilevel_roi_align, simple_roi_align,
                        map_roi_levels, generic_roi_align)
from .nms import nms, batched_nms, multiclass_nms, soft_nms
from .paste import paste_masks
from .deform_conv import (deform_conv2d, modulated_deform_conv2d,
                          pack_corners, packed_bilinear_gather)
from .point_sample import point_sample, rel_roi_points_to_img_points
from .roi_pool import (roi_pool, deform_roi_pooling,
                       multilevel_deform_roi_pool)
from .carafe import carafe, masked_conv2d
from .corner_pool import corner_pool

__all__ = [
    'roi_align', 'multilevel_roi_align', 'simple_roi_align', 'map_roi_levels',
    'generic_roi_align',
    'nms', 'batched_nms', 'multiclass_nms', 'soft_nms', 'paste_masks',
    'deform_conv2d', 'modulated_deform_conv2d', 'pack_corners',
    'packed_bilinear_gather',
    'point_sample', 'rel_roi_points_to_img_points',
    'roi_pool', 'deform_roi_pooling', 'multilevel_deform_roi_pool', 'carafe', 'masked_conv2d',
    'corner_pool',
]
