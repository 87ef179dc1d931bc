from .registry import (Registry, BACKBONES, NECKS, ROI_EXTRACTORS,
                       SHARED_HEADS, HEADS, LOSSES, DETECTORS, DATASETS,
                       PIPELINES, ANCHOR_GENERATORS, BBOX_ASSIGNERS,
                       BBOX_SAMPLERS, BBOX_CODERS, IOU_CALCULATORS)
from .config import Config, ConfigDict

__all__ = [
    'Registry', 'Config', 'ConfigDict',
    'BACKBONES', 'NECKS', 'ROI_EXTRACTORS', 'SHARED_HEADS', 'HEADS',
    'LOSSES', 'DETECTORS', 'DATASETS', 'PIPELINES', 'ANCHOR_GENERATORS',
    'BBOX_ASSIGNERS', 'BBOX_SAMPLERS', 'BBOX_CODERS', 'IOU_CALCULATORS',
]
