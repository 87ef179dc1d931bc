from .bbox_transforms import (bbox_overlaps, bbox2delta, delta2bbox,
                              clip_boxes, bbox_flip, bbox_mapping,
                              bbox_mapping_back, distance2bbox, bbox2result,
                              bbox_area)
from .anchors import (AnchorGenerator, LegacyAnchorGenerator, PointGenerator,
                      images_to_levels)
from .assigners import MaxIoUAssigner, AssignResult
from .samplers import (RandomSampler, PseudoSampler, SamplingResult,
                       add_gt_as_proposals)
from .boundary import generate_block_target, detail_target, interpolate_bilinear

__all__ = [
    'bbox_overlaps', 'bbox2delta', 'delta2bbox', 'clip_boxes', 'bbox_flip',
    'bbox_mapping', 'bbox_mapping_back', 'distance2bbox', 'bbox2result',
    'bbox_area', 'AnchorGenerator', 'LegacyAnchorGenerator', 'PointGenerator',
    'images_to_levels', 'MaxIoUAssigner', 'AssignResult', 'RandomSampler',
    'PseudoSampler', 'SamplingResult', 'add_gt_as_proposals',
    'generate_block_target', 'detail_target', 'interpolate_bilinear',
]
