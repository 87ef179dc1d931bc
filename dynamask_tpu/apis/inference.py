"""Single-image inference API.

Rebuild of the reference demo API (reference: mmdet/apis/inference.py:15-163
init_detector / inference_detector / show_result): same call shape, same
result format — ``(bbox_results, segm_results)`` with per-class numpy arrays
and per-instance binary masks — so downstream consumers port unchanged.
"""

from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import Config
from ..models import build_detector
from ..core.bbox_transforms import bbox2result
from ..data.transforms import Compose
from ..data.formatting import format_sample, canvas_for


class Detector:
    """A built detector + its weights + preprocessing pipeline."""

    def __init__(self, cfg: Config, variables, classes: Sequence[str]):
        self.cfg = cfg
        self.det = build_detector(cfg.model, cfg.get('train_cfg'),
                                  cfg.get('test_cfg'))
        self.variables = variables
        self.CLASSES = tuple(classes)
        self._test_fns = {}

        pipeline = [t for t in cfg.data['test']['pipeline']
                    if t['type'] != 'LoadImageFromFile']
        self.pipeline = Compose(pipeline)
        self.canvases = [(800, 1344), (1344, 800), (1344, 1344)]

    def _fn_for(self, canvas: Tuple[int, int], ori: Tuple[int, int]):
        key = (canvas, ori)
        if key not in self._test_fns:
            from .test import make_test_fn
            mask_thr = self.cfg.get('test_cfg', {}).get('rcnn', {}).get(
                'mask_thr_binary', 0.5)
            self._test_fns[key] = make_test_fn(
                self.det, self.variables, ori, mask_thr)
        return self._test_fns[key]


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None) -> Detector:
    """reference apis/inference.py:init_detector."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    det = build_detector(config.model, config.get('train_cfg'),
                         config.get('test_cfg'))

    # init params (random if no checkpoint)
    h, w = 800, 1344
    dummy = {
        'image': jnp.zeros((1, h, w, 3), jnp.float32),
        'img_shape': jnp.asarray([[h, w]], jnp.float32),
        'ori_shape': jnp.asarray([[h, w]], jnp.float32),
        'scale_factor': jnp.ones((1, 4), jnp.float32),
    }
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, dummy)

    classes = None
    if checkpoint is not None:
        if checkpoint.endswith(('.pth', '.pt')):
            # a torch (mmdet/torchvision) checkpoint: convert on the fly
            from ..engine.pretrained import apply_pretrained
            variables = apply_pretrained(variables, checkpoint)
        else:
            from ..engine.checkpoint import load_params_only, load_checkpoint
            import json
            params, bs = load_params_only(checkpoint, variables['params'])
            variables = {'params': params,
                         'batch_stats': bs or variables.get('batch_stats',
                                                            {})}
            meta_path = checkpoint + '.meta.json'
            if osp.isfile(meta_path):
                with open(meta_path) as f:
                    classes = json.load(f).get('CLASSES')
    elif (config.model or {}).get('pretrained'):
        from ..engine.pretrained import apply_pretrained
        variables = apply_pretrained(variables,
                                     config.model.get('pretrained'))
    if classes is None:
        from ..data.coco import COCO_CLASSES
        classes = COCO_CLASSES
    return Detector(config, variables, classes)


def inference_detector(model: Detector, img: Union[str, np.ndarray]):
    """reference apis/inference.py:inference_detector — returns
    (bbox_results, segm_results): per-class det arrays + per-instance masks."""
    import cv2
    if isinstance(img, str):
        img = cv2.imread(img, cv2.IMREAD_COLOR)
    results = {
        'img': img,
        'img_shape': img.shape,
        'ori_shape': img.shape,
    }
    results = model.pipeline(results)
    sample = format_sample(results, model.canvases)
    batch = {k: jnp.asarray(v)[None] for k, v in sample.items()
             if k in ('image', 'img_shape', 'ori_shape', 'scale_factor')}

    ori_h, ori_w = img.shape[:2]
    fn = model._fn_for(tuple(sample['image'].shape[:2]),
                       (int(np.ceil(ori_h / 32) * 32),
                        int(np.ceil(ori_w / 32) * 32)))
    out = jax.device_get(fn(batch))

    num_classes = len(model.CLASSES)
    dets = out['dets'][0]
    labels = out['labels'][0]
    valid = out['valid'][0].astype(bool)
    bbox_results = bbox2result(dets[:, :4], dets[:, 4], labels, valid,
                               num_classes)
    segm_results = [[] for _ in range(num_classes)]
    for d in np.nonzero(valid)[0]:
        segm_results[int(labels[d])].append(
            out['masks'][0, d, :ori_h, :ori_w])
    return bbox_results, segm_results


def show_result(img: np.ndarray, result, classes: Sequence[str],
                score_thr: float = 0.3,
                out_file: Optional[str] = None) -> np.ndarray:
    """Minimal visualization (reference base.py:show_result) — boxes, class
    names and mask overlays via cv2."""
    import cv2
    bbox_results, segm_results = (result if isinstance(result, tuple)
                                  else (result, None))
    canvas = img.copy()
    rng = np.random.RandomState(42)
    for cls, dets in enumerate(bbox_results):
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        for i, det in enumerate(dets):
            x1, y1, x2, y2, score = det
            if score < score_thr:
                continue
            cv2.rectangle(canvas, (int(x1), int(y1)), (int(x2), int(y2)),
                          color, 2)
            cv2.putText(canvas, f'{classes[cls]} {score:.2f}',
                        (int(x1), int(y1) - 4), cv2.FONT_HERSHEY_SIMPLEX,
                        0.5, color, 1)
            if segm_results is not None and i < len(segm_results[cls]):
                mask = segm_results[cls][i].astype(bool)
                canvas[mask] = canvas[mask] * 0.5 + np.array(color) * 0.5
    if out_file:
        cv2.imwrite(out_file, canvas)
    return canvas


async def async_inference_detector(model: Detector,
                                   img: Union[str, np.ndarray]):
    """Async single-image inference (reference apis/inference.py:119-144).

    JAX dispatch is already asynchronous; this wrapper keeps the host-side
    preprocessing + device round-trip off the event loop so concurrent
    requests interleave (the reference used CUDA streams for the same
    purpose)."""
    import asyncio
    loop = asyncio.get_event_loop()
    return await loop.run_in_executor(None, inference_detector, model, img)
