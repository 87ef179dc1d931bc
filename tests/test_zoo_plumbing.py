"""Runtime checks for the model-zoo plumbing added with the variant configs:
named RoI regression losses (reg_decoded_bbox + IoU family), soft-NMS at
RCNN test time, deformable RoI pooling packs, and GenericRoIExtractor
routing (reference recipes: configs/faster_rcnn/*giou|iou|bounded_iou|
ohem|soft_nms*, configs/dcn/*dpool*, configs/groie)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses
from tests.test_models import demo_batch, mini_mask_rcnn_cfg


def _faster_cfg(loss_bbox=None, reg_decoded=False, sampler=None,
                nms=None, roi_layer=None):
    model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
    model = dict(model, type='FasterRCNN')
    model['roi_head'] = dict(model['roi_head'])
    model['roi_head'].pop('mask_roi_extractor')
    model['roi_head'].pop('mask_head')
    if loss_bbox is not None:
        head = dict(model['roi_head']['bbox_head'])
        head['loss_bbox'] = loss_bbox
        head['reg_decoded_bbox'] = reg_decoded
        model['roi_head']['bbox_head'] = head
    if roi_layer is not None:
        ext = dict(model['roi_head']['bbox_roi_extractor'])
        ext['roi_layer'] = roi_layer
        model['roi_head']['bbox_roi_extractor'] = ext
    if sampler is not None:
        train_cfg['rcnn'] = dict(train_cfg['rcnn'], sampler=sampler)
    if nms is not None:
        test_cfg['rcnn'] = dict(test_cfg['rcnn'], nms=nms)
    return model, train_cfg, test_cfg


def _train_step(model, train_cfg, test_cfg, seed=0):
    det = build_detector(model, train_cfg, test_cfg)
    batch = demo_batch(3, b=1, h=64, w=64, g=3, s=16)
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(seed)},
                                  batch)

    def loss_fn(params, b, key):
        losses = det.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            b, method='forward_train', rngs={'sampling': key},
            mutable=['batch_stats'])[0]
        return parse_losses(losses)

    (total, log), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(variables['params'], batch,
                                jax.random.PRNGKey(2))
    return det, variables, batch, float(total), log, grads


@pytest.mark.parametrize('loss_type', ['GIoULoss', 'IoULoss',
                                       'BoundedIoULoss'])
def test_reg_decoded_iou_losses(loss_type):
    cfg = _faster_cfg(loss_bbox=dict(type=loss_type, loss_weight=10.0),
                      reg_decoded=True)
    det, _, _, total, log, grads = _train_step(*cfg)
    assert det.roi_head.reg_decoded_bbox
    assert np.isfinite(total)
    assert np.isfinite(float(log['loss_bbox']))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the IoU-family loss must actually differ from the default L1 path
    _, _, _, _, log_l1, _ = _train_step(*_faster_cfg())
    assert not np.isclose(float(log['loss_bbox']), float(log_l1['loss_bbox']))


def test_ohem_sampler_from_config():
    cfg = _faster_cfg(sampler=dict(type='OHEMSampler', num=32,
                                   pos_fraction=0.25))
    det, _, _, total, _, _ = _train_step(*cfg)
    assert type(det.roi_head.sampler_obj).__name__ == 'OHEMSampler'
    assert np.isfinite(total)


def test_soft_nms_rcnn_test():
    cfg = _faster_cfg(nms=dict(type='soft_nms', iou_threshold=0.5))
    det, variables, batch, _, _, _ = _train_step(*cfg)
    assert det.roi_head.nms_type == 'soft_nms'
    out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
        variables, batch)
    assert np.isfinite(np.asarray(out['dets'])).all()
    # scores sorted descending among valid slots (soft-NMS selection order)
    scores = np.asarray(out['dets'])[0, :, 4]
    valid = np.asarray(out['det_valid'])[0]
    s = scores[valid]
    assert (np.diff(s) <= 1e-6).all()


@pytest.mark.parametrize('pack', ['DeformRoIPoolPack',
                                  'ModulatedDeformRoIPoolPack'])
def test_deform_roi_pool_pack(pack):
    cfg = _faster_cfg(roi_layer=dict(type=pack, output_size=7,
                                     output_channels=32))
    det, variables, batch, total, _, grads = _train_step(*cfg)
    assert det.roi_head.bbox_extractor_obj is not None
    assert np.isfinite(total)
    names = jax.tree_util.tree_leaves_with_path(variables['params'])
    keys = {'/'.join(str(k.key) for k in path) for path, _ in names}
    assert any('offset_out' in k for k in keys)
    if pack.startswith('Modulated'):
        assert any('mask_out' in k for k in keys)


def test_generic_roi_extractor_mode():
    model, train_cfg, test_cfg = _faster_cfg()
    ext = dict(model['roi_head']['bbox_roi_extractor'])
    ext['type'] = 'GenericRoIExtractor'
    ext['aggregation'] = 'sum'
    model['roi_head']['bbox_roi_extractor'] = ext
    det = build_detector(model, train_cfg, test_cfg)
    assert det.roi_head.roi_extract_mode == 'generic_sum'
    _, _, _, total, _, _ = _train_step(model, train_cfg, test_cfg)
    assert np.isfinite(total)


def _single_stage_step(cfg_path, overrides=None):
    from dynamask_tpu.utils.config import Config
    cfg = Config.fromfile(cfg_path)
    model = dict(cfg.model)
    model['backbone'] = dict(model['backbone'], depth=18)
    if isinstance(model['neck'], (list, tuple)):  # chained (e.g. FPN+BFP)
        necks = [dict(n) for n in model['neck']]
        if necks[0].get('type', 'FPN') == 'FPN':
            necks[0]['in_channels'] = [64, 128, 256, 512]
        model['neck'] = necks
    else:
        model['neck'] = dict(model['neck'])
        if model['neck'].get('type', 'FPN') == 'FPN':
            model['neck']['in_channels'] = [64, 128, 256, 512]
    if overrides:
        for k, v in overrides.items():
            model[k] = v
    det = build_detector(model, cfg.get('train_cfg'), cfg.get('test_cfg'))
    batch = demo_batch(5, b=1, h=64, w=64, g=3, s=16)
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)

    def loss_fn(params, b):
        extra = {k: v for k, v in variables.items() if k != 'params'}
        out = det.apply(dict(extra, params=params), b,
                        method='forward_train',
                        mutable=list(extra.keys()) or False)
        losses = out[0] if isinstance(out, tuple) else out
        return parse_losses(losses)

    (total, log), grads = jax.jit(jax.value_and_grad(
        loss_fn, has_aux=True))(variables['params'], batch)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    return det, float(total), log, variables


def test_fcos_center_normbbox_centeronreg_giou():
    det, total, log, variables = _single_stage_step(
        'configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_'
        'gn-head_4x4_1x_coco.py')
    assert det.center_sampling and det.bbox_head.norm_on_bbox
    assert det.bbox_head.centerness_on_reg
    assert det.reg_loss_mode == 'giou'
    assert np.isfinite(total)
    keys = {'/'.join(str(k.key) for k in path) for path, _ in
            jax.tree_util.tree_leaves_with_path(variables['params'])}
    assert any('cls_gn_0' in k for k in keys)  # gn-head materialized


def test_fcos_dcn_on_last_conv():
    det, total, _, variables = _single_stage_step(
        'configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_'
        'gn-head_dcn_4x4_1x_coco.py')
    assert det.bbox_head.dcn_on_last_conv
    assert np.isfinite(total)
    keys = {'/'.join(str(k.key) for k in path) for path, _ in
            jax.tree_util.tree_leaves_with_path(variables['params'])}
    assert any('dcn_offset' in k for k in keys)


@pytest.mark.parametrize('method', ['minmax', 'partial_minmax'])
def test_reppoints_transforms(method):
    from dynamask_tpu.models.reppoints import points2bbox
    pts = jnp.asarray(np.random.RandomState(0).randn(6, 9, 2) * 5 + 10)
    boxes = points2bbox(pts, method)
    assert boxes.shape == (6, 4)
    ref = pts[:, :4] if method == 'partial_minmax' else pts
    np.testing.assert_allclose(np.asarray(boxes[:, 0]),
                               np.asarray(jnp.min(ref[..., 0], -1)), rtol=1e-6)
    det, total, _, _ = _single_stage_step(
        'configs/reppoints/reppoints_%s_r50_fpn_gn-neck+head_1x_coco.py'
        % method)
    assert det.transform_method == method
    assert np.isfinite(total)


def test_fovea_align():
    det, total, _, variables = _single_stage_step(
        'configs/foveabox/fovea_align_r50_fpn_gn-head_4x4_2x_coco.py')
    assert det.bbox_head.with_deform
    assert np.isfinite(total)
    keys = {'/'.join(str(k.key) for k in path) for path, _ in
            jax.tree_util.tree_leaves_with_path(variables['params'])}
    assert any('feature_adaption' in k for k in keys)


def test_libra_retinanet_balanced_l1():
    det, total, _, _ = _single_stage_step(
        'configs/libra_rcnn/libra_retinanet_r50_fpn_1x_coco.py')
    assert det.reg_loss_type == 'balanced_l1'
    assert np.isfinite(total)


def test_reppoints_grid_points():
    det, total, _, variables = _single_stage_step(
        'configs/reppoints/bbox_r50_grid_fpn_gn-neck+head_1x_coco.py')
    assert det.bbox_head.use_grid_points
    assert det.transform_method == 'minmax'
    assert np.isfinite(total)
    # grid mode regresses a 4-ch box, not 2*num_points offsets
    p = variables['params']['bbox_head']['reppoints_pts_init_out']['kernel']
    assert p.shape[-1] == 4
