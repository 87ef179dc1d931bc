"""Evaluation / test-loop entrypoint.

Rebuild of the reference test path (reference: mmdet/apis/test.py:15-114
single_gpu_test/multi_gpu_test + the RoI head's get_seg_masks paste). Device
work (forward, NMS, cascade, mask pasting onto a static canvas) runs in one
jit per canvas shape; only RLE encoding and COCO accumulation stay host-side
(SURVEY.md §7 'CPU↔TPU boundary for eval')."""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.paste import paste_masks


def _paste_epilogue(out: Dict, ch: int, cw: int, mask_thr: float) -> Dict:
    """Shared det→canvas-mask epilogue: paste per-RoI mask probs onto the
    static canvas and threshold on device (one copy for simple_test and
    aug_test so the two paths cannot diverge)."""
    b, d = out['dets'].shape[:2]
    probs = out['mask_probs']
    boxes = out['dets'][..., :4].reshape(b * d, 4)
    pasted = paste_masks(probs.reshape(b * d, *probs.shape[2:]),
                         boxes, ch, cw)
    masks = (pasted >= mask_thr).reshape(b, d, ch, cw)
    return {'dets': out['dets'], 'labels': out['labels'],
            'valid': out['det_valid'], 'masks': masks}


def make_test_fn(det, variables, mask_canvas: Tuple[int, int],
                 mask_thr: float = 0.5, bf16: bool = False):
    """Build the jitted full test step: simple_test + device-side pasting.

    Returns fn(batch) -> dict of padded per-image results. Masks come back
    as a boolean (B, D, canvas_h, canvas_w) tensor thresholded on device.
    With ``bf16=True`` the network computes in bfloat16 (box/score decode
    stays fp32 — core/fp16.py policy).
    """
    ch, cw = mask_canvas
    if bf16:
        from ..core.fp16 import to_bf16
        variables = to_bf16(variables)

    @jax.jit
    def fn(batch):
        if bf16:
            batch = dict(batch)
            batch['image'] = batch['image'].astype(jnp.bfloat16)
        out = det.apply(variables, batch, method='simple_test')
        return _paste_epilogue(out, ch, cw, mask_thr)

    return fn


def dataset_mask_canvas(dataset, multiple: int = 32) -> Tuple[int, int]:
    """Smallest canvas covering every image's original shape, rounded up to
    ``multiple``. Using a fixed (640, 640) would silently truncate datasets
    with larger images (Cityscapes is 1024x2048)."""
    infos = getattr(dataset, 'img_infos', None)
    if infos is None and hasattr(dataset, 'dataset'):  # wrappers
        infos = getattr(dataset.dataset, 'img_infos', None)
    if not infos:
        return (640, 640)
    max_h = max(int(i['height']) for i in infos)
    max_w = max(int(i['width']) for i in infos)
    rnd = lambda v: int(-(-v // multiple) * multiple)  # noqa: E731
    return (rnd(max_h), rnd(max_w))


def single_device_test(det, variables, dataset, samples_per_gpu: int = 1,
                       mask_canvas: Optional[Tuple[int, int]] = None,
                       mask_thr: float = 0.5,
                       max_images: Optional[int] = None,
                       progress: bool = True) -> List[Dict]:
    """Run the test loop, returning per-image result dicts for
    ``dataset.evaluate`` (reference single_gpu_test)."""
    from ..data import build_dataloader
    if mask_canvas is None:
        mask_canvas = dataset_mask_canvas(dataset)
    loader = build_dataloader(dataset, samples_per_gpu=samples_per_gpu,
                              workers_per_gpu=4, shuffle=False,
                              drop_last=False)
    fn = make_test_fn(det, variables, mask_canvas, mask_thr)

    results = []
    n_done = 0
    t0 = time.time()
    for batch_np in loader:
        img_ids = batch_np.pop('img_id')
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        out = jax.device_get(fn(batch))
        b = out['dets'].shape[0]
        for i in range(b):
            if max_images is not None and n_done >= max_images:
                break
            ori_h, ori_w = batch_np['ori_shape'][i].astype(int)
            valid = out['valid'][i].astype(bool)
            masks = [out['masks'][i, d, :ori_h, :ori_w]
                     for d in range(out['masks'].shape[1])]
            results.append({
                'img_id': int(img_ids[i]),
                'dets': out['dets'][i],
                'labels': out['labels'][i],
                'valid': valid,
                'masks': masks,
            })
            n_done += 1
        if progress and n_done % 50 == 0:
            fps = n_done / max(time.time() - t0, 1e-6)
            print(f'\r{n_done} imgs, {fps:.1f} img/s', end='', flush=True)
        if max_images is not None and n_done >= max_images:
            break
    if progress:
        print()
    return results


def aug_device_test(det, variables, dataset,
                    scales: Optional[Sequence[Tuple[int, int]]] = None,
                    flip: bool = True,
                    mask_canvas: Optional[Tuple[int, int]] = None,
                    mask_thr: float = 0.5,
                    max_images: Optional[int] = None,
                    bf16: bool = False,
                    progress: bool = True) -> List[Dict]:
    """Test-time-augmentation eval loop: the CLI route to ``aug_test``
    (reference: MultiScaleFlipAug test_time_aug.py:10 + BaseDetector
    forward_test TTA dispatch, base.py:120-160; aug merging per
    test_mixins.py:73,178). One image at a time (the reference's aug_test
    also requires batch=1); each (scale, flip) variant re-runs the dataset
    pipeline with the Resize target overridden, flips post-resize, and the
    jitted ``aug_test`` merges boxes/masks across the variants.
    """
    from ..data.formatting import format_sample
    from ..data.transforms import Resize

    if mask_canvas is None:
        mask_canvas = dataset_mask_canvas(dataset)
    ch, cw = mask_canvas

    base_ts = dataset.pipeline.transforms
    scale_list: List[Optional[Tuple[int, int]]] = (
        [tuple(s) for s in scales] if scales else [None])
    aug_specs = [(s, f) for s in scale_list
                 for f in ([False, True] if flip else [False])]
    flips = tuple(f for _, f in aug_specs)
    pipes = []
    for s, _ in aug_specs:
        ts = []
        for t in base_ts:
            if s is not None and isinstance(t, Resize):
                ts.append(Resize(img_scale=s, keep_ratio=t.keep_ratio))
            else:
                ts.append(t)
        pipes.append(ts)

    if bf16:
        from ..core.fp16 import to_bf16
        variables = to_bf16(variables)

    @jax.jit
    def fn(batches):
        if bf16:
            batches = [dict(b, image=b['image'].astype(jnp.bfloat16))
                       for b in batches]
        out = det.apply(variables, batches, list(flips), method='aug_test')
        return _paste_epilogue(out, ch, cw, mask_thr)

    canvases = getattr(dataset, 'canvases', [(ch, cw)])
    max_gts = getattr(dataset, 'max_gts', 100)
    crop = getattr(dataset, 'mask_crop_size', 128)
    results = []
    t0 = time.time()
    n = len(dataset) if max_images is None else min(len(dataset),
                                                    max_images)
    for idx in range(n):
        batches = []
        ori_shape = None
        for (s, f), ts in zip(aug_specs, pipes):
            # dataset.pre_pipeline seeds the results dict exactly like
            # __getitem__ (img_info/img_prefix/img_id + proposals for
            # proposal_file configs); fresh per aug since transforms mutate
            r: Dict = dataset.pre_pipeline(idx)
            for t in ts:
                r = t(r)
            if f:
                # flip the resized (pre-canvas) region: MultiScaleFlipAug
                # order (flip after Resize, before Pad)
                fh, fw = (np.asarray(r['img_shape'][:2]).astype(int)
                          if 'img_shape' in r else r['img'].shape[:2])
                r['img'] = np.ascontiguousarray(r['img'])
                r['img'][:fh, :fw] = r['img'][:fh, :fw][:, ::-1]
                r['flip'] = True
            sample = format_sample(
                r, canvases, max_gts, crop,
                with_semantic=getattr(dataset, 'with_semantic', False),
                max_proposals=getattr(dataset, 'max_proposals', 1000))
            ori_shape = sample['ori_shape']
            batches.append({k: jnp.asarray(v)[None]
                            for k, v in sample.items()})
        out = jax.device_get(fn(batches))
        ori_h, ori_w = np.asarray(ori_shape).astype(int)
        masks = [out['masks'][0, d, :ori_h, :ori_w]
                 for d in range(out['masks'].shape[1])]
        results.append({
            'img_id': int(dataset.sample_id(idx)),
            'dets': out['dets'][0],
            'labels': out['labels'][0],
            'valid': out['valid'][0].astype(bool),
            'masks': masks,
        })
        if progress and (idx + 1) % 20 == 0:
            fps = (idx + 1) / max(time.time() - t0, 1e-6)
            print(f'\r{idx + 1} imgs (x{len(aug_specs)} augs), '
                  f'{fps:.1f} img/s', end='', flush=True)
    if progress:
        print()
    return results


def multi_device_test(det, variables, dataset, samples_per_device: int = 1,
                      mask_canvas: Optional[Tuple[int, int]] = None,
                      mask_thr: float = 0.5,
                      max_images: Optional[int] = None,
                      devices=None, progress: bool = False) -> List[Dict]:
    """Data-parallel eval over a device mesh (reference multi_gpu_test,
    mmdet/apis/test.py:66-114): the batch dim is sharded over the mesh, the
    padded per-image outputs are gathered host-side — the single-controller
    equivalent of collect_results_cpu/gpu (apis/test.py:117-189).

    Results are ordered identically to ``single_device_test`` so the two
    produce byte-identical evaluation inputs.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..data import build_dataloader
    from ..engine import data_parallel_mesh

    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    mesh = data_parallel_mesh(devices)
    shard = NamedSharding(mesh, P('data'))

    if mask_canvas is None:
        mask_canvas = dataset_mask_canvas(dataset)
    # global batch divisible by the mesh; loader pads ragged tails by
    # wrapping (drop_last=False), extras are cut by the img_id bookkeeping
    global_bs = samples_per_device * n_dev
    n_proc = jax.process_count()
    # multi-host: each process loads its 1/n_proc shard and contributes its
    # local devices; outputs are allgathered so every host holds the full
    # result list (reference collect_results_cpu, apis/test.py:117-160)
    loader = build_dataloader(dataset,
                              samples_per_gpu=global_bs // n_proc,
                              workers_per_gpu=4, shuffle=False,
                              num_shards=n_proc,
                              shard_index=jax.process_index(),
                              drop_last=False)
    fn = make_test_fn(det, variables, mask_canvas, mask_thr)

    results = []
    seen = set()
    n_done = 0
    t0 = time.time()
    for batch_np in loader:
        img_ids = batch_np.pop('img_id')
        if n_proc > 1:
            from jax.experimental import multihost_utils
            batch = {k: jax.make_array_from_process_local_data(
                shard, jnp.asarray(v)) for k, v in batch_np.items()}
            out = jax.device_get(
                multihost_utils.process_allgather(fn(batch), tiled=True))
            img_ids = multihost_utils.process_allgather(
                jnp.asarray(img_ids), tiled=True)
            ori = multihost_utils.process_allgather(
                jnp.asarray(batch_np['ori_shape']), tiled=True)
            batch_np = dict(batch_np, ori_shape=jax.device_get(ori))
        else:
            batch = {k: jax.device_put(jnp.asarray(v), shard)
                     for k, v in batch_np.items()}
            out = jax.device_get(fn(batch))
        b = out['dets'].shape[0]
        for i in range(b):
            iid = int(img_ids[i])
            if iid in seen:  # wrap-around padding from the sampler
                continue
            if max_images is not None and n_done >= max_images:
                break
            seen.add(iid)
            ori_h, ori_w = batch_np['ori_shape'][i].astype(int)
            results.append({
                'img_id': iid,
                'dets': out['dets'][i],
                'labels': out['labels'][i],
                'valid': out['valid'][i].astype(bool),
                'masks': [out['masks'][i, d, :ori_h, :ori_w]
                          for d in range(out['masks'].shape[1])],
            })
            n_done += 1
        if progress and n_done % 50 == 0:
            fps = n_done / max(time.time() - t0, 1e-6)
            print(f'\r{n_done} imgs, {fps:.1f} img/s', end='', flush=True)
        if max_images is not None and n_done >= max_images:
            break
    if progress:
        print()
    return results


def run_eval(cfg, checkpoint=None, metrics=('bbox',), max_images=None):
    """Build + evaluate in one call (used by tools/test_robustness.py; the
    reference equivalent is the single_gpu_test path of tools/test.py)."""
    from .inference import init_detector
    from ..data import build_dataset
    model = init_detector(cfg, checkpoint)
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    results = single_device_test(model.det, model.variables, dataset,
                                 max_images=max_images)
    return dataset.evaluate(results, metric=list(metrics))
