from .registry import (Registry, BACKBONES, NECKS, ROI_EXTRACTORS,
                       SHARED_HEADS, HEADS, LOSSES, DETECTORS, DATASETS,
                       PIPELINES, ANCHOR_GENERATORS, BBOX_ASSIGNERS,
                       BBOX_SAMPLERS, BBOX_CODERS, IOU_CALCULATORS)
from .config import Config, ConfigDict
from .env import collect_env, profile_time, profile_summary, NiceRepr

__all__ = [
    'Registry', 'Config', 'ConfigDict',
    'collect_env', 'profile_time', 'profile_summary', 'NiceRepr',
    'BACKBONES', 'NECKS', 'ROI_EXTRACTORS', 'SHARED_HEADS', 'HEADS',
    'LOSSES', 'DETECTORS', 'DATASETS', 'PIPELINES', 'ANCHOR_GENERATORS',
    'BBOX_ASSIGNERS', 'BBOX_SAMPLERS', 'BBOX_CODERS', 'IOU_CALCULATORS',
]
