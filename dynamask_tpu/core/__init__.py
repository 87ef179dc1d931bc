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
from .coders import (DeltaXYWHBBoxCoder, LegacyDeltaXYWHBBoxCoder,
                     TBLRBBoxCoder, PseudoBBoxCoder)
from .mean_ap import eval_map, eval_recalls, average_precision
from .merge_augs import (recover_boxes, to_aug_frame, merge_aug_bboxes,
                         merge_aug_masks, merge_aug_scores)
from .fp16 import to_bf16, to_f32, cast_floating
from .mask_targets import mask_targets_from_crops
from .class_names import (get_classes, coco_classes, voc_classes,
                          cityscapes_classes, wider_face_classes,
                          imagenet_det_classes, imagenet_vid_classes,
                          dataset_aliases)

__all__ = [
    'bbox_overlaps', 'bbox2delta', 'delta2bbox', 'clip_boxes', 'bbox_flip',
    'bbox_mapping', 'bbox_mapping_back', 'distance2bbox', 'bbox2result',
    'bbox_area', 'AnchorGenerator', 'LegacyAnchorGenerator', 'PointGenerator',
    'images_to_levels', 'MaxIoUAssigner', 'AssignResult', 'RandomSampler',
    'PseudoSampler', 'SamplingResult', 'add_gt_as_proposals',
    'generate_block_target', 'detail_target', 'interpolate_bilinear',
    'DeltaXYWHBBoxCoder', 'LegacyDeltaXYWHBBoxCoder', 'TBLRBBoxCoder',
    'PseudoBBoxCoder', 'eval_map', 'eval_recalls', 'average_precision',
    'recover_boxes', 'to_aug_frame', 'merge_aug_bboxes', 'merge_aug_masks',
    'merge_aug_scores', 'to_bf16', 'to_f32', 'cast_floating',
    'mask_targets_from_crops',
    'get_classes', 'coco_classes', 'voc_classes', 'cityscapes_classes',
    'wider_face_classes', 'imagenet_det_classes', 'imagenet_vid_classes',
    'dataset_aliases',
]
