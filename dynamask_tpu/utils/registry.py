"""String-keyed registries for config-driven module construction.

The reference framework builds every component from config dicts through named
registries (reference: mmdet/models/builder.py:1-100, mmdet/datasets/builder.py:22-23).
We keep the same public contract — ``cfg = dict(type='FPN', ...)`` resolved by name —
so reference configs port verbatim, but the implementation is a plain dict registry
with no torch/mmcv dependencies.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """A name -> class/function registry.

    Example:
        BACKBONES = Registry('backbone')

        @BACKBONES.register_module()
        class ResNet: ...

        model = BACKBONES.build(dict(type='ResNet', depth=50))
    """

    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Any] = {}

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Any]:
        return dict(self._module_dict)

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return (f'{self.__class__.__name__}(name={self._name}, '
                f'items={sorted(self._module_dict)})')

    def get(self, key: str) -> Optional[Any]:
        return self._module_dict.get(key)

    def register_module(self, name: Optional[str] = None,
                        force: bool = False,
                        module: Optional[Any] = None) -> Callable:
        """Register a class or function, usable as decorator or direct call."""
        if module is not None:
            self._register(module, name=name, force=force)
            return module

        def _decorator(cls):
            self._register(cls, name=name, force=force)
            return cls

        return _decorator

    def _register(self, module: Any, name: Optional[str], force: bool) -> None:
        if not (inspect.isclass(module) or inspect.isfunction(module)):
            raise TypeError(f'module must be a class or function, got {type(module)}')
        key = name if name is not None else module.__name__
        if not force and key in self._module_dict:
            raise KeyError(f'{key} is already registered in {self._name}')
        self._module_dict[key] = module

    def build(self, cfg: dict, **default_kwargs) -> Any:
        """Instantiate an entry from ``cfg['type']`` with the remaining keys as kwargs.

        ``default_kwargs`` are merged in (cfg wins) — mirrors mmcv's
        ``build_from_cfg(cfg, registry, default_args)``.
        """
        if not isinstance(cfg, dict) or 'type' not in cfg:
            raise TypeError(f'cfg must be a dict with a "type" key, got {cfg!r}')
        cfg = dict(cfg)
        obj_type = cfg.pop('type')
        if isinstance(obj_type, str):
            obj_cls = self.get(obj_type)
            if obj_cls is None:
                raise KeyError(f'{obj_type} is not registered in the '
                               f'{self._name} registry. Available: '
                               f'{sorted(self._module_dict)}')
        else:
            obj_cls = obj_type
        for k, v in default_kwargs.items():
            cfg.setdefault(k, v)
        return obj_cls(**cfg)


# The framework-wide registries, one per pluggable component family
# (reference: mmdet/models/builder.py:5-11 defines BACKBONES/NECKS/ROI_EXTRACTORS/
# SHARED_HEADS/HEADS/LOSSES/DETECTORS; datasets/builder.py defines DATASETS/PIPELINES;
# core/ defines anchor/bbox-tool registries).
BACKBONES = Registry('backbone')
NECKS = Registry('neck')
ROI_EXTRACTORS = Registry('roi_extractor')
SHARED_HEADS = Registry('shared_head')
HEADS = Registry('head')
LOSSES = Registry('loss')
DETECTORS = Registry('detector')

DATASETS = Registry('dataset')
PIPELINES = Registry('pipeline')

ANCHOR_GENERATORS = Registry('anchor_generator')
BBOX_ASSIGNERS = Registry('bbox_assigner')
BBOX_SAMPLERS = Registry('bbox_sampler')
BBOX_CODERS = Registry('bbox_coder')
IOU_CALCULATORS = Registry('iou_calculator')
