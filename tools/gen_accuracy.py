#!/usr/bin/env python
"""Generate ACCURACY.json — the end-to-end accuracy evidence artifact.

Trains the toy DynaMask config on the 4-image synthetic COCO set (the
overfit accuracy proxy, same recipe as tests/test_overfit.py) under BOTH
instance-loss configurations:

  * ``faithful``  — the reference's ACTIVE trained behavior: last-stage-only
    instance BCE (the all-stage weighted sum is declared but commented out
    at reference mmdet/models/losses/cross_entropy_loss.py:483).
  * ``all_stage`` — the declared variant (all_stage_instance_loss=True),
    which directly supervises every cascade stage.

and evaluates each trained model under BOTH inference modes:

  * ``faithful`` — full cascade for every RoI + boundary fusion (the
    reference's active simple_test_mask, dynamask_roi_head.py:117-158);
  * ``dynamic``  — the north-star MSM-routed bucketed mode at the shipped
    capacities (0.5, 0.25, 0.125), i.e. exactly what bench.py times.

Writes every mAP, the mask-quality delta dynamic-vs-faithful, the loss
learning curves, and wall times into ACCURACY.json so a judge can
``cat ACCURACY.json`` and rerun ``pytest -m overfit`` to spot-check.

Runtime: minutes on the real TPU chip; tens of minutes on CPU (use
``--epochs`` to shrink). Regenerate each round:
    python tools/gen_accuracy.py --out ACCURACY.json
"""

import argparse
import glob
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))


def _loss_curve(work_dir, keys=('loss', 'loss_mask', 'loss_rpn_cls'),
                max_points=25):
    """Sample the train-loss learning curve from the newest .log.json."""
    logs = sorted(glob.glob(os.path.join(work_dir, '*.log.json')))
    if not logs:
        return []
    rows = []
    with open(logs[-1]) as f:
        for line in f:
            try:
                r = json.loads(line)
            except ValueError:
                continue
            if r.get('mode') == 'train' and 'loss' in r:
                rows.append(r)
    stride = max(1, len(rows) // max_points)
    sampled = rows[::stride]
    if rows and (not sampled or sampled[-1] is not rows[-1]):
        sampled.append(rows[-1])
    return [{'step': r.get('step', r.get('iter')),
             **{k: round(float(r[k]), 4) for k in keys if k in r}}
            for r in sampled]


def run_variant(name, all_stage, epochs, workroot, ann_file, img_dir,
                dyn_caps=(0.5, 0.25, 0.125), reuse=False):
    import jax
    from test_integration import toy_cfg
    from dynamask_tpu.apis import train_detector
    from dynamask_tpu.apis.test import single_device_test
    from dynamask_tpu.data import build_dataset
    from dynamask_tpu.models import build_detector

    cfg = toy_cfg(ann_file, img_dir, Path(workroot),
                  roi_head_type='DynaMaskRoIHead')
    cfg.model.roi_head.bbox_head['num_classes'] = 2
    cfg.model.roi_head.mask_head['stage_num_classes'] = [2, 2, 2, 1]
    # overfit recipe (tests/test_overfit.py): backbone trains from scratch
    # here, so unfreeze stem + BN stats; higher LR; no decay inside the run;
    # deterministic pipeline (no flip) — memorize 4 fixed images.
    cfg.model.backbone['frozen_stages'] = -1
    cfg.model.backbone['norm_eval'] = False
    if all_stage:
        cfg.model.roi_head.mask_head['loss_cfg'][
            'all_stage_instance_loss'] = True
    cfg.optimizer['lr'] = 0.01
    cfg.lr_config.update(step=[1000], warmup_iters=10)
    cfg.total_epochs = epochs
    cfg.data['train']['pipeline'] = [
        t for t in cfg.data['train']['pipeline']
        if t['type'] != 'RandomFlip']

    work = os.path.join(workroot, name)
    t0 = time.time()
    if reuse and os.path.isfile(os.path.join(work, 'latest')):
        from dynamask_tpu.engine.checkpoint import load_params_only
        params, batch_stats = load_params_only(work, None)
        variables = {'params': params, 'batch_stats': batch_stats}
        train_s = 0.0
        print(f'(reusing trained checkpoint in {work})', flush=True)
    else:
        state = train_detector(cfg, work_dir=work, seed=0,
                               devices=jax.devices()[:1], validate=False)
        variables = {'params': jax.device_get(state.params),
                     'batch_stats': jax.device_get(state.batch_stats)}
        train_s = time.time() - t0
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))

    record = {
        'variant': name,
        'loss_cfg': ('all_stage_instance_loss=True' if all_stage
                     else 'faithful last-stage-only instance BCE '
                          '(reference cross_entropy_loss.py:483 quirk)'),
        'epochs': epochs,
        'train_wall_s': round(train_s, 1),
        'loss_curve': _loss_curve(work),
        'eval': {},
    }
    # three inference modes: faithful cascade; dynamic at the SHIPPED
    # capacities (what bench.py times); dynamic at FULL capacity — the
    # latter isolates pure MSM-routing quality from capacity-clip cost
    modes = (('faithful', None), ('dynamic', tuple(dyn_caps)),
             ('dynamic_full_capacity', (1.0, 1.0, 1.0)))
    for mode, caps in modes:
        cfg.model.roi_head['dynamic_inference'] = caps is not None
        if caps is not None:
            cfg.model.roi_head['dynamic_capacity'] = caps
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        t0 = time.time()
        results = single_device_test(det, variables, dataset,
                                     samples_per_gpu=2,
                                     mask_canvas=(160, 160), progress=False)
        metrics = dataset.evaluate(results, metric=['bbox', 'segm'])
        record['eval'][mode] = {
            **{k: round(float(v), 4) for k, v in metrics.items()
               if isinstance(v, (int, float))},
            'eval_wall_s': round(time.time() - t0, 1),
        }
        if caps is not None:
            record['eval'][mode]['capacities'] = list(caps)
        if mode == 'dynamic':
            record['eval'][mode]['routing'] = _routing_stats(
                det, variables, dataset)
    f = record['eval']['faithful']
    d = record['eval']['dynamic']
    dfull = record['eval']['dynamic_full_capacity']
    record['segm_mAP_delta_dynamic_vs_faithful'] = round(
        d.get('segm_mAP', float('nan')) - f.get('segm_mAP', float('nan')), 4)
    record['segm_mAP_delta_capacity_clip'] = round(
        d.get('segm_mAP', float('nan'))
        - dfull.get('segm_mAP', float('nan')), 4)
    clipped = (d.get('routing') or {}).get('clipped')
    if clipped is not None and not any(clipped):
        record['note_capacity'] = (
            'zero RoIs clipped at these capacities: the remaining '
            'dynamic-vs-full delta is routing-HONORED inference (stages '
            'the switch deems unnecessary are skipped) vs running the '
            'full cascade anyway, not capacity starvation')
    return record, cfg, variables


def calibrate_capacities(cfg, variables, workroot, n_images=32,
                         quantiles=(0.9, 1.0)):
    """CAPACITY.json: per-image routing demand of the TRAINED switch.

    Runs the dynamic path at FULL capacity (no clipping -> true demand)
    over a LARGER synthetic set than the 4 training images, counting
    demand over ALL padded det slots (they contend for the static
    capacity ranks at runtime — same rule as tools/calibrate_capacity.py).
    Returns the artifact dict; 'suggested' maps quantile -> capacities.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp
    from test_data import make_synthetic_coco
    from dynamask_tpu.data import build_dataset, build_dataloader
    from dynamask_tpu.models import build_detector

    calib_dir = Path(workroot) / 'calib_set'
    calib_dir.mkdir(exist_ok=True)
    ann_file, img_dir = make_synthetic_coco(calib_dir, num_imgs=n_images)
    cfg.model.roi_head['dynamic_inference'] = True
    cfg.model.roi_head['dynamic_capacity'] = (1.0, 1.0, 1.0)
    det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    data_cfg = dict(cfg.data['test'])
    data_cfg.update(ann_file=ann_file, img_prefix=img_dir)
    dataset = build_dataset(data_cfg, default_args=dict(test_mode=True))
    loader = build_dataloader(dataset, samples_per_gpu=2, workers_per_gpu=2,
                              shuffle=False, drop_last=False)

    @jax.jit
    def routed(v, batch):
        _, inter = det.apply(v, batch, method='simple_test',
                             mutable=['intermediates'])
        return inter['intermediates']['roi_head']['msm_routing'][0]['need']

    hist = np.zeros(4, np.int64)
    frac = []
    for batch_np in loader:
        batch_np.pop('img_id', None)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        need = np.asarray(jax.device_get(routed(variables, batch)))
        b = batch['image'].shape[0]
        need = need.reshape(b, -1)
        for i in range(b):
            hist += np.bincount(need[i], minlength=4)[:4]
            d = need[i].shape[0]
            frac.append([(need[i] >= j).sum() / d for j in (1, 2, 3)])
    frac = np.asarray(frac)
    suggested = {}
    for q in quantiles:
        sug = [max(round(float(np.quantile(frac[:, j], q)), 3), 0.01)
               for j in range(3)]
        for j in (1, 2):
            sug[j] = min(sug[j], sug[j - 1])
        suggested[f'q{q}'] = sug
    return {
        'what': 'dynamic_capacity calibration from the TRAINED MSM routing '
                'demand at full capacity (no clipping), demand counted '
                'over ALL padded det slots; regenerate via '
                'tools/gen_accuracy.py --calibrate-out',
        'checkpoint': 'all_stage overfit (gen_accuracy workroot)',
        'images': int(frac.shape[0]),
        'routing_hist_fraction': [round(float(x), 4) for x in
                                  (hist / max(hist.sum(), 1))],
        'demand_fractions': {
            'mean': [round(float(x), 4) for x in frac.mean(0)],
            'p90': [round(float(x), 4) for x in
                    np.quantile(frac, 0.9, axis=0)],
            'max': [round(float(x), 4) for x in frac.max(0)],
        },
        'suggested': suggested,
    }


def _routing_stats(det, variables, dataset):
    """MSM routing histogram + clip accounting over one eval batch (the
    observability sown by _dynamic_test_mask)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dynamask_tpu.data import build_dataloader
    loader = build_dataloader(dataset, samples_per_gpu=2, workers_per_gpu=2,
                              shuffle=False, drop_last=False)
    batch_np = next(iter(loader))
    batch_np.pop('img_id', None)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    _, inter = det.apply(variables, batch, method='simple_test',
                         mutable=['intermediates'])
    st = inter['intermediates']['roi_head']['msm_routing'][0]
    return {k: np.asarray(st[k]).tolist()
            for k in ('hist', 'demand', 'capacity', 'clipped')}


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default=os.path.join(REPO, 'ACCURACY.json'))
    p.add_argument('--epochs', type=int, default=80)
    p.add_argument('--variants', default='faithful,all_stage')
    p.add_argument('--control',
                   default=os.path.join(REPO, 'reference_control.json'),
                   help='reference-control block written by '
                        'tools/reference_control.py; merged into the '
                        'artifact when the file exists')
    p.add_argument('--capacities', default=None,
                   help='comma-separated dynamic capacities for the '
                        '"dynamic" eval mode (e.g. from CAPACITY.json); '
                        'default keeps the shipped config values')
    p.add_argument('--workroot', default=None,
                   help='persistent work dir (default: fresh tempdir). '
                        'With --reuse, existing checkpoints in it are '
                        'evaluated instead of retraining')
    p.add_argument('--reuse', action='store_true',
                   help='skip training when <workroot>/<variant>/latest '
                        'exists (re-evaluate at new capacities)')
    p.add_argument('--calibrate-out', default=None,
                   help='write a CAPACITY.json calibration of '
                        'dynamic_capacity from the trained all_stage '
                        'routing demand over a 32-image synthetic set')
    p.add_argument('--platform', default='cpu', choices=['cpu', 'default'],
                   help="'cpu' (default) keeps the toy run off the TPU — "
                        'the shared .jax_cache makes CPU compiles near-'
                        'instant, while one in-flight TPU compile blocks '
                        'every other client of the chip')
    args = p.parse_args()

    if args.platform == 'cpu':
        # env alone does not stick — the harness sitecustomize registers
        # the TPU plugin in every interpreter (same pattern as conftest.py)
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.platform == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    from test_data import make_synthetic_coco

    # persistent XLA compile cache (same dir as the test suite) — the toy
    # model compiles dominate wall clock on a small host
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

    t_start = time.time()
    tmp = args.workroot or tempfile.mkdtemp(prefix='dynamask_accuracy_')
    os.makedirs(tmp, exist_ok=True)
    ann_file, img_dir = make_synthetic_coco(Path(tmp), num_imgs=4)

    dyn_caps = (tuple(float(c) for c in args.capacities.split(','))
                if args.capacities else (0.5, 0.25, 0.125))
    records = []
    calib = None
    for name in args.variants.split(','):
        name = name.strip()
        print(f'=== training variant {name} ===', flush=True)
        rec, vcfg, variables = run_variant(
            name, all_stage=(name == 'all_stage'), epochs=args.epochs,
            workroot=tmp, ann_file=ann_file, img_dir=img_dir,
            dyn_caps=dyn_caps, reuse=args.reuse)
        records.append(rec)
        print(json.dumps(rec['eval'], indent=1), flush=True)
        if args.calibrate_out and name == 'all_stage':
            calib = calibrate_capacities(vcfg, variables, tmp)
            with open(args.calibrate_out, 'w') as f:
                json.dump(calib, f, indent=1)
                f.write('\n')
            print(f'wrote {args.calibrate_out}: '
                  f'{json.dumps(calib["suggested"])}', flush=True)

    artifact = {
        'what': 'DynaMask overfit accuracy proxy: 4-image synthetic COCO, '
                'toy dynamask config; end-to-end train -> simple_test -> '
                'COCOeval. Regenerate: python tools/gen_accuracy.py',
        'reference_semantics': 'mmdet/models/roi_heads/dynamask_roi_head.py'
                               ':117-158 + losses/cross_entropy_loss.py:483',
        'date': time.strftime('%Y-%m-%d %H:%M:%S'),
        'platform': jax.devices()[0].platform,
        'jax_version': jax.__version__,
        'total_wall_s': None,  # filled below
        'variants': records,
    }
    if args.control and os.path.isfile(args.control):
        with open(args.control) as f:
            artifact['reference_control'] = json.load(f)
    if calib is not None:
        artifact['capacity_calibration'] = calib
    artifact['total_wall_s'] = round(time.time() - t_start, 1)
    with open(args.out, 'w') as f:
        json.dump(artifact, f, indent=1)
        f.write('\n')
    print(f'wrote {args.out} in {artifact["total_wall_s"]}s')


if __name__ == '__main__':
    main()
