"""Round-3 parity-tail components: DIoU/CIoU losses, legacy SSD anchors,
formatting pipeline shims, CustomDataset, RetinaSepBNHead, PISA single-stage
detectors, DetectoRS-ResNeXt, the all-stage DynaMask instance supervision
flag."""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))


# ------------------------------------------------------------------ fast

class TestIoULossVariants:
    def test_perfect_overlap(self):
        from dynamask_tpu.models.losses import iou_loss
        b = jnp.asarray([[0., 0., 10., 10.], [5., 5., 8., 9.]])
        for mode in ('diou', 'ciou'):
            loss = iou_loss(b, b, mode=mode, avg_factor=1.0)
            assert float(loss) == pytest.approx(0.0, abs=1e-5), mode

    def test_diou_penalizes_center_distance(self):
        from dynamask_tpu.models.losses import iou_loss
        a = jnp.asarray([[0., 0., 10., 10.]])
        # same IoU=0 but different center distances
        near = jnp.asarray([[10., 0., 20., 10.]])
        far = jnp.asarray([[30., 0., 40., 10.]])
        l_near = float(iou_loss(a, near, mode='diou', avg_factor=1.0))
        l_far = float(iou_loss(a, far, mode='diou', avg_factor=1.0))
        assert l_far > l_near > 1.0 - 1e-6

    def test_ciou_penalizes_aspect_mismatch(self):
        from dynamask_tpu.models.losses import iou_loss
        tgt = jnp.asarray([[0., 0., 10., 10.]])
        same_ar = jnp.asarray([[1., 1., 11., 11.]])
        # same IoU-ish overlap but a 4:1 aspect ratio
        diff_ar = jnp.asarray([[0., 3., 20., 8.]])
        c_same = float(iou_loss(same_ar, tgt, mode='ciou', avg_factor=1.0))
        d_same = float(iou_loss(same_ar, tgt, mode='diou', avg_factor=1.0))
        assert c_same == pytest.approx(d_same, abs=1e-6)  # v = 0
        c_diff = float(iou_loss(diff_ar, tgt, mode='ciou', avg_factor=1.0))
        d_diff = float(iou_loss(diff_ar, tgt, mode='diou', avg_factor=1.0))
        assert c_diff > d_diff  # aspect term strictly adds

    def test_registered(self):
        from dynamask_tpu.utils.registry import LOSSES
        for name in ('DIoULoss', 'CIoULoss'):
            loss = LOSSES.build(dict(type=name, loss_weight=2.0))
            v = loss(jnp.asarray([[0., 0., 4., 4.]]),
                     jnp.asarray([[1., 1., 5., 5.]]), avg_factor=1.0)
            assert np.isfinite(float(v)) and float(v) > 0


class TestLegacySSDAnchors:
    def test_offsets_differ_from_v2(self):
        from dynamask_tpu.core.anchors import (SSDAnchorGenerator,
                                               LegacySSDAnchorGenerator)
        kw = dict(strides=(8, 16, 32), ratios=((2,), (2, 3), (2, 3)),
                  basesize_ratio_range=(0.15, 0.9), input_size=300)
        new = SSDAnchorGenerator(**kw)
        old = LegacySSDAnchorGenerator(**kw)
        for a_new, a_old in zip(new.base_anchors, old.base_anchors):
            assert a_new.shape == a_old.shape
            # legacy centers sit at (stride-1)/2 -> all coords shift by -0.5,
            # and widths shrink by 1 -> x1 shifts exactly 0 relative to that
            assert not np.allclose(a_new, a_old)
            cx_new = (a_new[:, 0] + a_new[:, 2]) / 2
            cx_old = (a_old[:, 0] + a_old[:, 2]) / 2
            np.testing.assert_allclose(cx_new - cx_old, 0.5, atol=1e-4)
            w_new = a_new[:, 2] - a_new[:, 0]
            w_old = a_old[:, 2] - a_old[:, 0]
            np.testing.assert_allclose(w_new - w_old, 1.0, atol=1e-4)


class TestFormattingShims:
    def test_reference_pipeline_tail_loads_and_passes_through(self):
        from dynamask_tpu.data.transforms import Compose
        pipeline = Compose([
            dict(type='DefaultFormatBundle'),
            dict(type='Collect', keys=['img', 'gt_bboxes', 'gt_labels'],
                 meta_keys=('filename', 'ori_shape')),
            dict(type='ImageToTensor', keys=['img']),
            dict(type='ToTensor', keys=['gt_labels']),
            dict(type='ToDataContainer',
                 fields=(dict(key='img', stack=True),)),
            dict(type='WrapFieldsToLists'),
        ])
        results = {'img': np.zeros((8, 8, 3), np.float32),
                   'gt_bboxes': np.zeros((2, 4), np.float32),
                   'gt_labels': np.zeros(2, np.int64)}
        out = pipeline(dict(results))
        assert out['img'].shape == (8, 8, 3)
        assert out['gt_bboxes'].shape == (2, 4)

    def test_transpose_is_real(self):
        from dynamask_tpu.data.transforms import Compose
        p = Compose([dict(type='Transpose', keys=['img'], order=(2, 0, 1))])
        out = p({'img': np.zeros((8, 9, 3), np.float32)})
        assert out['img'].shape == (3, 8, 9)

    def test_load_multichannel(self, tmp_path):
        import cv2
        from dynamask_tpu.data.transforms import LoadMultiChannelImageFromFiles
        names = []
        for i in range(2):
            name = f'c{i}.png'
            cv2.imwrite(str(tmp_path / name),
                        np.full((6, 7), i + 1, np.uint8))
            names.append(name)
        t = LoadMultiChannelImageFromFiles()
        out = t({'img_info': {'filename': names},
                 'img_prefix': str(tmp_path)})
        assert out['img'].shape == (6, 7, 2)
        assert out['img'][0, 0, 0] == 1 and out['img'][0, 0, 1] == 2


class TestCustomDataset:
    def _make(self, tmp_path):
        import cv2
        infos = []
        for i in range(3):
            name = f'im{i}.jpg'
            cv2.imwrite(str(tmp_path / name),
                        np.random.RandomState(i).randint(
                            0, 255, (64, 80, 3), np.uint8))
            infos.append(dict(
                filename=name, width=80, height=64,
                ann=dict(bboxes=[[10., 10., 40., 40.], [5., 5., 20., 30.]],
                         labels=[0, 1], bboxes_ignore=[], labels_ignore=[])))
        ann = tmp_path / 'mid.json'
        ann.write_text(json.dumps(infos))
        return str(ann)

    def test_build_and_getitem(self, tmp_path):
        from dynamask_tpu.data import build_dataset
        ann = self._make(tmp_path)
        ds = build_dataset(dict(
            type='CustomDataset', ann_file=ann, img_prefix=str(tmp_path),
            classes=['a', 'b'],
            canvases=[(96, 96)], max_gts=8,
            pipeline=[dict(type='LoadImageFromFile'),
                      dict(type='LoadAnnotations', with_bbox=True),
                      dict(type='Normalize',
                           mean=[0., 0., 0.], std=[1., 1., 1.],
                           to_rgb=True),
                      dict(type='DefaultFormatBundle'),
                      dict(type='Collect',
                           keys=['img', 'gt_bboxes', 'gt_labels'])]))
        assert len(ds) == 3
        s = ds[0]
        assert s['image'].shape == (96, 96, 3)
        assert s['gt_boxes'].shape == (8, 4)
        assert int(s['gt_valid'].sum()) == 2

    def test_evaluate_perfect_dets(self, tmp_path):
        from dynamask_tpu.data import build_dataset
        ann = self._make(tmp_path)
        ds = build_dataset(dict(
            type='CustomDataset', ann_file=ann, img_prefix=str(tmp_path),
            classes=['a', 'b'], test_mode=True,
            canvases=[(96, 96)],
            pipeline=[dict(type='LoadImageFromFile'),
                      dict(type='Normalize',
                           mean=[0., 0., 0.], std=[1., 1., 1.],
                           to_rgb=True)]))
        results = []
        for i in range(len(ds)):
            a = ds.get_ann_info(i)
            dets = np.concatenate(
                [a['bboxes'], np.ones((len(a['bboxes']), 1), np.float32)], 1)
            results.append(dict(img_id=i, dets=dets, labels=a['labels'],
                                valid=np.ones(len(dets), bool)))
        m = ds.evaluate(results)
        assert m['mAP'] == pytest.approx(1.0, abs=1e-6)


class TestDynaMaskAllStageLoss:
    def test_all_stage_weights_change_loss_and_grads(self):
        from dynamask_tpu.models.dynamask_roi_head import dyna_mask_loss
        r = np.random.RandomState(0)
        preds = [jnp.asarray(r.randn(4, s, s, 1), jnp.float32)
                 for s in (14, 28)]
        details = [jnp.asarray(r.randn(4, s, s, 1), jnp.float32)
                   for s in (14, 28)]
        targets = [jnp.asarray((r.rand(4, s, s) > 0.5), jnp.float32)
                   for s in (14, 28)]
        ml = jax.nn.one_hot(jnp.asarray([0, 1, 0, 1]), 2)
        valid = jnp.ones(4, bool)
        fuse = jnp.asarray([0.7, 0.3])

        def loss(w, p0):
            ps = [p0, preds[1]]
            return dyna_mask_loss(ps, details, targets, ml, valid, fuse,
                                  stage_detail_loss_weight=(0.5, 0.5),
                                  start_stage=4,
                                  stage_instance_loss_weight=w)['loss_masks']

        # faithful: no gradient reaches stage-0 instance logits
        g_faithful = jax.grad(lambda p: loss(None, p))(preds[0])
        assert float(jnp.abs(g_faithful).max()) == 0.0
        # all-stage: stage-0 instance logits are supervised
        g_all = jax.grad(lambda p: loss((0.5, 1.0), p))(preds[0])
        assert float(jnp.abs(g_all).max()) > 0.0


# ------------------------------------------------------------------ slow

@pytest.mark.slow
class TestRetinaSepBN:
    def test_shared_convs_separate_bn(self):
        from dynamask_tpu.models.single_stage import RetinaSepBNHead
        head = RetinaSepBNHead(num_classes=4, num_ins=3, feat_channels=32,
                               in_channels=32, stacked_convs=2,
                               num_anchors=9)
        feats = [jnp.zeros((1, s, s, 32)) for s in (16, 8, 4)]
        variables = head.init({'params': jax.random.PRNGKey(0)}, feats)
        params = variables['params']
        # conv weights shared: one kernel per stacked conv, not per level
        assert 'cls_conv_0' in params and 'cls_conv_2' not in params
        # BN per (level, conv)
        assert 'cls_bn_0_0' in params and 'cls_bn_2_1' in params
        cls_scores, bbox_preds = head.apply(variables, feats)
        assert cls_scores[0].shape == (1, 16, 16, 36)
        assert bbox_preds[2].shape == (1, 4, 4, 36)


@pytest.mark.slow
class TestPISASingleStage:
    def test_pisa_ssd_train_losses(self):
        from dynamask_tpu.utils.config import Config
        from dynamask_tpu.models import build_detector, parse_losses
        from test_ssd import ssd_toy_batch
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/pisa/pisa_ssd300_coco.py'))
        cfg.model['bbox_head']['num_classes'] = 8
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        from dynamask_tpu.models.pisa import PISASSD
        assert isinstance(det, PISASSD)
        batch = ssd_toy_batch()
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        losses, _ = det.apply(variables, batch, method='forward_train',
                              mutable=['batch_stats'])
        assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_carl'}
        total, _ = parse_losses(losses)
        assert np.isfinite(float(total))

    def test_pisa_retinanet_train_losses(self):
        from dynamask_tpu.utils.config import Config
        from dynamask_tpu.models import build_detector, parse_losses
        from test_models import demo_batch
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/pisa/pisa_retinanet_r50_fpn_1x_coco.py'))
        cfg.model['bbox_head']['num_classes'] = 8
        cfg.model['backbone']['depth'] = 18
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        from dynamask_tpu.models.pisa import PISARetinaNet
        assert isinstance(det, PISARetinaNet)
        batch = demo_batch(0, b=1, h=128, w=128, g=4)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        losses, _ = det.apply(variables, batch, method='forward_train',
                              mutable=['batch_stats'])
        assert set(losses) == {'loss_cls', 'loss_bbox', 'loss_carl'}
        total, _ = parse_losses(losses)
        assert np.isfinite(float(total))


@pytest.mark.slow
class TestGHMAndLegacy:
    def _train(self, path):
        from dynamask_tpu.utils.config import Config
        from dynamask_tpu.models import build_detector, parse_losses
        from test_models import demo_batch
        cfg = Config.fromfile(os.path.join(os.path.dirname(__file__), '..',
                                           path))
        cfg.model['backbone']['depth'] = 18
        cfg.model['bbox_head']['num_classes'] = 8
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        batch = demo_batch(0, b=1, h=128, w=128, g=4)
        v = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)
        losses, _ = det.apply(v, batch, method='forward_train',
                              mutable=['batch_stats'])
        total, _ = parse_losses(losses)
        assert np.isfinite(float(total)), losses
        return det, v, batch

    def test_ghm_retinanet(self):
        det, _, _ = self._train('configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py')
        assert det.cls_loss_type == 'ghmc' and det.reg_loss_type == 'ghmr'

    def test_legacy_retinanet(self):
        det, v, batch = self._train(
            'configs/legacy_1.x/retinanet_r50_fpn_1x_coco_v1.py')
        assert det.legacy
        out = det.apply(v, batch, method='simple_test')
        assert np.isfinite(np.asarray(out['dets'])).all()
        # legacy base anchors differ from v2 (centers at (stride-1)/2)
        from dynamask_tpu.core.anchors import AnchorGenerator
        legacy = det._anchor_generator()
        stock = AnchorGenerator(strides=det.anchor_strides,
                                ratios=det.anchor_ratios,
                                octave_base_scale=4, scales_per_octave=3)
        assert not np.allclose(legacy.base_anchors[0], stock.base_anchors[0])


@pytest.mark.slow
class TestDetectoRSResNeXt:
    def test_grouped_forward(self):
        from dynamask_tpu.models.builder import build_backbone
        bb = build_backbone(dict(type='DetectoRS_ResNeXt', depth=50,
                                 groups=32, base_width=4,
                                 out_indices=(0, 1, 2, 3),
                                 frozen_stages=-1, norm_eval=False,
                                 rfp_inplanes=None,
                                 stage_with_sac=(False, True, True, True)))
        x = jnp.zeros((1, 64, 64, 3))
        variables = bb.init({'params': jax.random.PRNGKey(0)}, x)
        # grouped 3x3: input-channel dim is width // groups
        w = variables['params']['layer2_block0']['sac_conv2']['weight']
        assert w.shape[2] * 32 == w.shape[3]  # cin/groups * groups == width
        assert w.shape[3] == 256  # width = 128 * 4/64 * 32
        outs = bb.apply(variables, x)
        assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]


class TestUtilsTail:
    def test_collect_env_keys(self):
        from dynamask_tpu.utils import collect_env
        env = collect_env()
        assert 'Python' in env and 'JAX' in env and 'DynaMask-TPU' in env

    def test_profile_time_blocks_and_accumulates(self, capsys):
        from dynamask_tpu.utils import profile_time, profile_summary
        x = jnp.ones((8, 8))
        with profile_time('toy_scope') as p:
            p.out = x * 2  # scope blocks on the OUTPUT at exit
        out = capsys.readouterr().out
        assert 'toy_scope' in out and 'ms' in out
        assert profile_summary()['toy_scope'] >= 0.0
        # end_stream callable form (resolved at exit)
        ys = []
        with profile_time('toy_scope2', end_stream=lambda: ys, verbose=False):
            ys.append(x + 1)
        assert profile_summary()['toy_scope2'] >= 0.0

    def test_nice_repr(self):
        from dynamask_tpu.utils import NiceRepr

        class Group(NiceRepr):
            def __len__(self):
                return 3

        assert '(3)' in repr(Group())
        assert '(3)' in str(Group())
