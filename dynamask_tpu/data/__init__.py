from .mask_codec import (encode_mask, decode_rle, polygons_to_mask,
                         ann_to_mask, rle_area, rle_iou,
                         mask_to_rle_counts, rle_counts_to_mask,
                         rle_counts_to_string, rle_string_to_counts)
from .cocoeval import CocoEvaluator, bbox_iou_xywh
from .transforms import (LoadImageFromFile, LoadAnnotations, Resize,
                         RandomFlip, Normalize, Pad, Compose)
from .formatting import format_sample, collate, canvas_for
from .coco import CocoDataset, CocoIndex, build_dataset, COCO_CLASSES
from .lvis import LVISV1Dataset, LVISV05Dataset, LvisEvaluator
from .cityscapes import CityscapesDataset, CITYSCAPES_CLASSES
from .voc import XMLDataset, VOCDataset, WIDERFaceDataset, VOC_CLASSES
from .custom import CustomDataset
from .dataset_wrappers import (ConcatDataset, RepeatDataset,
                               ClassBalancedDataset)
from .loader import DataLoader, GroupedBatchSampler, build_dataloader

__all__ = [
    'encode_mask', 'decode_rle', 'polygons_to_mask', 'ann_to_mask',
    'rle_area', 'rle_iou', 'mask_to_rle_counts', 'rle_counts_to_mask',
    'rle_counts_to_string', 'rle_string_to_counts',
    'CocoEvaluator', 'bbox_iou_xywh',
    'LoadImageFromFile', 'LoadAnnotations', 'Resize', 'RandomFlip',
    'Normalize', 'Pad', 'Compose', 'format_sample', 'collate', 'canvas_for',
    'CocoDataset', 'CocoIndex', 'build_dataset', 'COCO_CLASSES',
    'LVISV1Dataset', 'LVISV05Dataset', 'LvisEvaluator',
    'CityscapesDataset', 'CITYSCAPES_CLASSES',
    'XMLDataset', 'VOCDataset', 'WIDERFaceDataset', 'VOC_CLASSES',
    'CustomDataset',
    'ConcatDataset', 'RepeatDataset', 'ClassBalancedDataset',
    'DataLoader', 'GroupedBatchSampler', 'build_dataloader',
]
