"""Config-driven model construction.

Accepts the reference's config schema verbatim (reference:
mmdet/models/builder.py + configs/dynamask/coco/r50-dynamask-1x.py) and
translates it into this framework's flax modules. The ``type=`` names match
the reference registries so configs port unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from ..utils.registry import BACKBONES, NECKS, HEADS, DETECTORS
from .resnet import ResNet
from .fpn import FPN, PAFPN
from .rpn_head import RPNHead
from .bbox_head import Shared2FCBBoxHead, ConvFCBBoxHead, Shared4Conv1FCBBoxHead
from .fcn_mask_head import FCNMaskHead
from .roi_head import StandardRoIHead
from .detectors import TwoStageDetector, MaskRCNN, FasterRCNN


def _cfg(d: Optional[dict]) -> dict:
    return dict(d) if d else {}


def _resnet_feature_hooks(cfg: dict) -> dict:
    """Translate the reference ResNet config keys for norm_cfg / conv_cfg /
    dcn / plugins / strides / dilations into ResNet module fields
    (reference resnet.py:304-651 + mmcv build_conv_layer/build_norm_layer).
    Mutates ``cfg`` (pops the translated keys), returns extra kwargs."""
    extra = {}
    norm_cfg = _cfg(cfg.pop('norm_cfg', None))
    if norm_cfg.get('type') == 'GN':
        extra['norm'] = 'gn'
        extra['gn_groups'] = norm_cfg.get('num_groups', 32)
    conv_cfg = _cfg(cfg.pop('conv_cfg', None))
    if conv_cfg.get('type') == 'ConvWS':
        extra['conv_ws'] = True
    dcn = _cfg(cfg.pop('dcn', None))
    stage_with_dcn = cfg.pop('stage_with_dcn', None)
    if dcn:
        extra['stage_with_dcn'] = tuple(
            stage_with_dcn if stage_with_dcn is not None
            else (False, True, True, True))
        extra['dcn_deform_groups'] = dcn.get(
            'deform_groups', dcn.get('deformable_groups', 1))
        extra['dcn_modulated'] = 'v2' in str(dcn.get('type', 'DCN')).lower()
    plugins = cfg.pop('plugins', None)
    if plugins:
        per_stage = [[], [], [], []]
        for p in plugins:
            p = _cfg(p)
            pc = _cfg(p.get('cfg'))
            type_name = pc.pop('type')
            pos = p.get('position', 'after_conv3')
            stages = p.get('stages', (True,) * 4)
            spec = (pos, type_name, tuple(sorted(pc.items())))
            for si, on in enumerate(stages):
                if on:
                    per_stage[si].append(spec)
        extra['plugins_per_stage'] = tuple(
            tuple(s) for s in per_stage)
    if 'strides' in cfg:
        cfg['strides'] = tuple(cfg['strides'])
    if 'dilations' in cfg:
        cfg['dilations'] = tuple(cfg['dilations'])
    return extra


def build_backbone(cfg: dict):
    cfg = _cfg(cfg)
    t = cfg.pop('type')
    if t == 'ResNet':
        extra = _resnet_feature_hooks(cfg)
        cfg['out_indices'] = tuple(cfg.get('out_indices', (0, 1, 2, 3)))
        return ResNet(**extra, **cfg)
    if t == 'ResNetV1d':
        extra = _resnet_feature_hooks(cfg)
        cfg['out_indices'] = tuple(cfg.get('out_indices', (0, 1, 2, 3)))
        return ResNet(deep_stem=True, avg_down=True, **extra, **cfg)
    if t == 'ResNeXt':
        extra = _resnet_feature_hooks(cfg)
        cfg['out_indices'] = tuple(cfg.get('out_indices', (0, 1, 2, 3)))
        return ResNet(**extra, **cfg)
    if t == 'HRNet':
        from .hrnet import HRNet
        cfg.pop('norm_cfg', None)
        return HRNet(extra=cfg.get('extra'),
                     norm_eval=cfg.get('norm_eval', True),
                     frozen_stages=cfg.get('frozen_stages', -1))
    if t == 'Res2Net':
        from .res2net import Res2Net
        cfg.pop('norm_cfg', None)
        cfg.pop('style', None)
        cfg.pop('dcn', None)
        cfg.pop('stage_with_dcn', None)
        cfg['out_indices'] = tuple(cfg.get('out_indices', (0, 1, 2, 3)))
        return Res2Net(**cfg)
    if t == 'RegNet':
        from .regnet import RegNet
        cfg.pop('norm_cfg', None)
        cfg.pop('style', None)
        dcn = _cfg(cfg.pop('dcn', None))
        stage_with_dcn = cfg.pop('stage_with_dcn', None)
        if dcn:
            cfg['stage_with_dcn'] = tuple(
                stage_with_dcn if stage_with_dcn is not None
                else (False, True, True, True))
            cfg['dcn_deform_groups'] = dcn.get(
                'deform_groups', dcn.get('deformable_groups', 1))
            cfg['dcn_modulated'] = 'v2' in str(dcn.get('type',
                                                       'DCNv2')).lower()
        cfg['out_indices'] = tuple(cfg.get('out_indices', (0, 1, 2, 3)))
        return RegNet(**cfg)
    if t in ('DetectoRS_ResNet', 'DetectoRS_ResNeXt'):
        from .detectors_resnet import DetectoRSResNet
        sac = _cfg(cfg.get('sac'))
        groups = cfg.get('groups', 32 if t == 'DetectoRS_ResNeXt' else 1)
        return DetectoRSResNet(
            depth=cfg.get('depth', 50),
            num_stages=cfg.get('num_stages', 4),
            out_indices=tuple(cfg.get('out_indices', (0, 1, 2, 3))),
            frozen_stages=cfg.get('frozen_stages', 1),
            norm_eval=cfg.get('norm_eval', True),
            stage_with_sac=tuple(cfg.get('stage_with_sac',
                                         (False, True, True, True))),
            sac_use_deform=sac.get('use_deform', False),
            rfp_inplanes=cfg.get('rfp_inplanes'),
            groups=groups,
            base_width=cfg.get('base_width', 4))
    if t == 'HourglassNet':
        from .hourglass import HourglassNet
        cfg.pop('norm_cfg', None)
        return HourglassNet(
            downsample_times=cfg.get('downsample_times', 5),
            num_stacks=cfg.get('num_stacks', 2),
            stage_channels=tuple(cfg.get('stage_channels',
                                         (256, 256, 384, 384, 384, 512))),
            stage_blocks=tuple(cfg.get('stage_blocks', (2, 2, 2, 2, 2, 4))),
            feat_channel=cfg.get('feat_channel', 256))
    raise KeyError(f'unsupported backbone {t}')


def build_neck(cfg: dict):
    if isinstance(cfg, (list, tuple)):  # chained necks, e.g. [FPN, BFP]
        from .necks_extra import ChainedNeck
        return ChainedNeck(necks=tuple(build_neck(c) for c in cfg))
    if not cfg:
        # C4-style detectors have no neck (reference two_stage.py builds
        # the neck only if the key is present)
        from .necks_extra import IdentityNeck
        return IdentityNeck()
    cfg = _cfg(cfg)
    t = cfg.pop('type')
    if t == 'HRFPN':
        from .hrnet import HRFPN
        return HRFPN(out_channels=cfg.get('out_channels', 256),
                     num_outs=cfg.get('num_outs', 5),
                     stride=cfg.get('stride', 1))
    if t == 'BFP':
        from .necks_extra import BFP
        return BFP(in_channels=cfg.get('in_channels', 256),
                   num_levels=cfg.get('num_levels', 5),
                   refine_level=cfg.get('refine_level', 2),
                   refine_type=cfg.get('refine_type'))
    if t == 'NASFPN':
        from .necks_extra import NASFPN
        return NASFPN(in_channels=tuple(cfg['in_channels']),
                      out_channels=cfg.get('out_channels', 256),
                      num_outs=cfg.get('num_outs', 5),
                      stack_times=cfg.get('stack_times', 7),
                      start_level=cfg.get('start_level', 0))
    if t == 'NASFCOS_FPN':
        from .nasfcos import NASFCOS_FPN
        return NASFCOS_FPN(in_channels=tuple(cfg['in_channels']),
                           out_channels=cfg.get('out_channels', 256),
                           num_outs=cfg.get('num_outs', 5),
                           start_level=cfg.get('start_level', 1))
    if t == 'FPN_CARAFE':
        from .carafe import FPN_CARAFE
        up = _cfg(cfg.get('upsample_cfg'))
        return FPN_CARAFE(in_channels=tuple(cfg['in_channels']),
                          out_channels=cfg.get('out_channels', 256),
                          num_outs=cfg.get('num_outs', 5),
                          start_level=cfg.get('start_level', 0),
                          up_kernel=up.get('up_kernel', 5),
                          encoder_kernel=up.get('encoder_kernel', 3),
                          compressed_channels=up.get('compressed_channels',
                                                     64))
    if t == 'RFP':
        from .necks_extra import RFP
        rfp_steps = cfg.pop('rfp_steps', 2)
        rfp_backbone = _cfg(cfg.pop('rfp_backbone'))
        rfp_backbone.pop('pretrained', None)
        aspp_out = cfg.pop('aspp_out_channels', 64)
        aspp_dil = tuple(cfg.pop('aspp_dilations', (1, 3, 6, 1)))
        fpn = FPN(in_channels=tuple(cfg['in_channels']),
                  out_channels=cfg.get('out_channels', 256),
                  num_outs=cfg.get('num_outs', 5),
                  start_level=cfg.get('start_level', 0),
                  add_extra_convs=cfg.get('add_extra_convs', False))
        backbones = tuple(build_backbone(dict(rfp_backbone))
                          for _ in range(rfp_steps - 1))
        return RFP(fpn=fpn, rfp_backbones=backbones,
                   aspp_out_channels=aspp_out, aspp_dilations=aspp_dil)
    cls = {'FPN': FPN, 'PAFPN': PAFPN}.get(t)
    if cls is None:
        raise KeyError(f'unsupported neck {t}')
    cfg['in_channels'] = tuple(cfg['in_channels'])
    norm_cfg = _cfg(cfg.pop('norm_cfg', None))
    if norm_cfg.get('type') == 'GN':
        cfg['norm'] = 'gn'
        cfg['gn_groups'] = norm_cfg.get('num_groups', 32)
    elif norm_cfg.get('type') in ('BN', 'SyncBN'):
        cfg['norm'] = 'bn'
    return cls(**cfg)


def build_rpn_head(cfg: dict):
    cfg = _cfg(cfg)
    assert cfg.pop('type') == 'RPNHead'
    anchor_cfg = _cfg(cfg.pop('anchor_generator', {}))
    num_anchors = (len(anchor_cfg.get('scales', [8])) *
                   len(anchor_cfg.get('ratios', [0.5, 1.0, 2.0])))
    head = RPNHead(in_channels=cfg.get('in_channels', 256),
                   feat_channels=cfg.get('feat_channels', 256),
                   num_anchors=num_anchors)
    return head, anchor_cfg, _cfg(cfg.get('bbox_coder')), \
        _cfg(cfg.get('loss_cls')), _cfg(cfg.get('loss_bbox'))


def build_bbox_head(cfg: dict):
    cfg = _cfg(cfg)
    t = cfg.pop('type')
    from .bbox_head import BBoxHead
    cls = {'Shared2FCBBoxHead': Shared2FCBBoxHead,
           'ConvFCBBoxHead': ConvFCBBoxHead,
           'Shared4Conv1FCBBoxHead': Shared4Conv1FCBBoxHead,
           'BBoxHead': BBoxHead}.get(t)
    coder = _cfg(cfg.pop('bbox_coder', {}))
    loss_cls = _cfg(cfg.pop('loss_cls', {}))
    loss_bbox = _cfg(cfg.pop('loss_bbox', {}))
    if t == 'DoubleConvFCBBoxHead':
        from .double_head import DoubleConvFCBBoxHead
        head = DoubleConvFCBBoxHead(
            num_classes=cfg.get('num_classes', 80),
            in_channels=cfg.get('in_channels', 256),
            roi_feat_size=cfg.get('roi_feat_size', 7),
            num_convs=cfg.get('num_convs', 4),
            num_fcs=cfg.get('num_fcs', 2),
            conv_out_channels=cfg.get('conv_out_channels', 1024),
            fc_out_channels=cfg.get('fc_out_channels', 1024),
            reg_class_agnostic=cfg.get('reg_class_agnostic', False))
        return head, coder, loss_cls, loss_bbox
    if cls is None:
        raise KeyError(f'unsupported bbox head {t}')
    norm_cfg = _cfg(cfg.get('norm_cfg'))
    head = cls(num_classes=cfg.get('num_classes', 80),
               in_channels=cfg.get('in_channels', 256),
               roi_feat_size=cfg.get('roi_feat_size', 7),
               fc_out_channels=cfg.get('fc_out_channels', 1024),
               reg_class_agnostic=cfg.get('reg_class_agnostic', False),
               with_reg=cfg.get('with_reg', True),
               norm='gn' if norm_cfg.get('type') == 'GN' else None,
               gn_groups=norm_cfg.get('num_groups', 32))
    if not cfg.get('with_reg', True):
        loss_bbox = dict(loss_bbox, loss_weight=0.0)
    return head, coder, loss_cls, loss_bbox


def build_roi_head(cfg: dict, train_cfg: dict, test_cfg: dict):
    cfg = _cfg(cfg)
    t = cfg.pop('type')
    head_cfg = cfg['bbox_head']
    if isinstance(head_cfg, (list, tuple)):  # cascade: list of stage heads
        head_cfg = head_cfg[0]
    bbox_head, coder, loss_cls, loss_bbox = build_bbox_head(head_cfg)
    bbox_extractor = _cfg(cfg.get('bbox_roi_extractor'))
    mask_extractor = _cfg(cfg.get('mask_roi_extractor'))
    rcnn_raw = train_cfg.get('rcnn') if train_cfg else None
    if isinstance(rcnn_raw, (list, tuple)):  # cascade: per-stage train cfgs
        rcnn_train = _cfg(rcnn_raw[0])
    else:
        rcnn_train = _cfg(rcnn_raw)
    rcnn_test = _cfg(test_cfg.get('rcnn')) if test_cfg else {}
    assigner = _cfg(rcnn_train.get('assigner'))
    sampler = _cfg(rcnn_train.get('sampler'))

    # typed sampler from config (CombinedSampler / OHEM / balanced
    # variants); the plain RandomSampler stays the in-head default
    sampler_obj = None
    if sampler.get('type', 'RandomSampler') != 'RandomSampler':
        from ..utils.registry import BBOX_SAMPLERS
        if sampler['type'] == 'ScoreHLRSampler':
            from . import pisa  # noqa: F401 — registers ScoreHLRSampler
        sampler_obj = BBOX_SAMPLERS.build(dict(sampler))

    common = dict(
        bbox_head=bbox_head,
        sampler_obj=sampler_obj,
        num_classes=head_cfg.get('num_classes', 80),
        featmap_strides=tuple(bbox_extractor.get('featmap_strides',
                                                 (4, 8, 16, 32))),
        bbox_roi_out=_cfg(bbox_extractor.get('roi_layer')).get('output_size', 7),
        mask_roi_out=_cfg(mask_extractor.get('roi_layer')).get('output_size', 14),
        num_samples=sampler.get('num', 512),
        pos_fraction=sampler.get('pos_fraction', 0.25),
        max_pos=int(sampler.get('num', 512) * sampler.get('pos_fraction', 0.25)),
        add_gt_as_proposals=sampler.get('add_gt_as_proposals', True),
        pos_iou_thr=assigner.get('pos_iou_thr', 0.5),
        neg_iou_thr=assigner.get('neg_iou_thr', 0.5),
        min_pos_iou=assigner.get('min_pos_iou', 0.5),
        match_low_quality=assigner.get('match_low_quality', True),
        target_means=tuple(coder.get('target_means', (0., 0., 0., 0.))),
        target_stds=tuple(coder.get('target_stds', (0.1, 0.1, 0.2, 0.2))),
        loss_cls_weight=loss_cls.get('loss_weight', 1.0),
        loss_bbox_weight=loss_bbox.get('loss_weight', 1.0),
        # named regression loss + reg_decoded_bbox (reference bbox_head.py
        # builds loss_bbox from the registry; IoU-family losses pair with
        # reg_decoded_bbox=True)
        reg_loss_type={'L1Loss': 'l1', 'SmoothL1Loss': 'smooth_l1',
                       'BalancedL1Loss': 'balanced_l1', 'GIoULoss': 'giou',
                       'IoULoss': 'iou', 'BoundedIoULoss': 'bounded_iou',
                       }.get(loss_bbox.get('type', 'L1Loss'), 'l1'),
        reg_decoded_bbox=bool(head_cfg.get('reg_decoded_bbox', False)),
        smoothl1_beta=loss_bbox.get('beta', 1.0),
        score_thr=rcnn_test.get('score_thr', 0.05),
        nms_iou_thr=_cfg(rcnn_test.get('nms')).get('iou_threshold', 0.5),
        max_per_img=rcnn_test.get('max_per_img', 100),
        nms_type=_cfg(rcnn_test.get('nms')).get('type', 'nms'),
        soft_sigma=_cfg(rcnn_test.get('nms')).get('sigma', 0.5),
        soft_min_score=_cfg(rcnn_test.get('nms')).get('min_score', 1e-3),
        # GenericRoIExtractor (configs/groie) pools all levels, no routing
        roi_extract_mode=(
            'generic_' + bbox_extractor.get('aggregation', 'sum')
            if bbox_extractor.get('type') == 'GenericRoIExtractor'
            else 'single'),
    )
    bbox_layer = _cfg(bbox_extractor.get('roi_layer'))
    if bbox_layer.get('type') in ('DeformRoIPoolPack',
                                  'ModulatedDeformRoIPoolPack',
                                  'DeformRoIPoolingPack',
                                  'ModulatedDeformRoIPoolingPack'):
        from .roi_head import DeformRoIPoolPackExtractor
        common['bbox_extractor_obj'] = DeformRoIPoolPackExtractor(
            out_size=bbox_layer.get('output_size', 7),
            featmap_strides=tuple(bbox_extractor.get(
                'featmap_strides', (4, 8, 16, 32))),
            trans_std=bbox_layer.get('trans_std', 0.1),
            sample_per_part=bbox_layer.get('sample_per_part', 4),
            modulated=bbox_layer['type'].startswith('Modulated'))

    if t in ('StandardRoIHead', 'MaskScoringRoIHead'):
        if cfg.get('shared_head'):
            from .shared_head import ResLayerSharedHead
            shc = _cfg(cfg['shared_head'])
            assert shc.pop('type') == 'ResLayer', shc
            shc.pop('norm_cfg', None)
            shc.pop('pretrained', None)
            common['shared_head'] = ResLayerSharedHead(**shc)
        mask_head = None
        if cfg.get('mask_head'):
            mhc = _cfg(cfg['mask_head'])
            mt = mhc.pop('type')
            assert mt == 'FCNMaskHead', mt
            mnorm = _cfg(mhc.get('norm_cfg'))
            mask_head = FCNMaskHead(
                num_convs=mhc.get('num_convs', 4),
                in_channels=mhc.get('in_channels', 256),
                conv_out_channels=mhc.get('conv_out_channels', 256),
                num_classes=mhc.get('num_classes', 80),
                class_agnostic=mhc.get('class_agnostic', False),
                norm='gn' if mnorm.get('type') == 'GN' else None,
                gn_groups=mnorm.get('num_groups', 32),
                upsample_type=_cfg(mhc.get('upsample_cfg')).get(
                    'type', 'deconv'))
            common['loss_mask_weight'] = _cfg(
                mhc.get('loss_mask')).get('loss_weight', 1.0)
        if t == 'MaskScoringRoIHead':
            from .mask_scoring import MaskScoringRoIHead
            iou_cfg = _cfg(cfg.get('mask_iou_head'))
            return MaskScoringRoIHead(
                mask_head=mask_head,
                loss_iou_weight=_cfg(iou_cfg.get('loss_iou')).get(
                    'loss_weight', 0.5),
                **common)
        return StandardRoIHead(mask_head=mask_head, **common)
    if t == 'PISARoIHead':
        from .pisa import PISARoIHead
        mask_head = None
        if cfg.get('mask_head'):
            mhc = _cfg(cfg['mask_head'])
            assert mhc.pop('type') == 'FCNMaskHead'
            mnorm = _cfg(mhc.get('norm_cfg'))
            mask_head = FCNMaskHead(
                num_convs=mhc.get('num_convs', 4),
                in_channels=mhc.get('in_channels', 256),
                conv_out_channels=mhc.get('conv_out_channels', 256),
                num_classes=mhc.get('num_classes', 80),
                class_agnostic=mhc.get('class_agnostic', False),
                norm='gn' if mnorm.get('type') == 'GN' else None,
                gn_groups=mnorm.get('num_groups', 32),
                upsample_type=_cfg(mhc.get('upsample_cfg')).get(
                    'type', 'deconv'))
            common['loss_mask_weight'] = _cfg(
                mhc.get('loss_mask')).get('loss_weight', 1.0)
        isr = _cfg(rcnn_train.get('isr'))
        carl = _cfg(rcnn_train.get('carl'))
        return PISARoIHead(
            mask_head=mask_head,
            isr_k=isr.get('k', 2.0), isr_bias=isr.get('bias', 0.0),
            carl_k=carl.get('k', 1.0), carl_bias=carl.get('bias', 0.2),
            smooth_l1_beta=_cfg(head_cfg.get('loss_bbox')).get('beta', 1.0),
            **common)
    if t == 'DoubleHeadRoIHead':
        from .double_head import DoubleHeadRoIHead
        return DoubleHeadRoIHead(
            reg_roi_scale_factor=cfg.get('reg_roi_scale_factor', 1.3),
            **common)
    if t == 'GridRoIHead':
        from .grid_rcnn import GridHead, GridRoIHead
        gh = _cfg(cfg.get('grid_head'))
        grid_extractor = _cfg(cfg.get('grid_roi_extractor'))
        head = GridHead(
            grid_points=gh.get('grid_points', 9),
            num_convs=gh.get('num_convs', 8),
            roi_feat_size=gh.get('roi_feat_size', 14),
            in_channels=gh.get('in_channels', 256),
            point_feat_channels=gh.get('point_feat_channels', 64),
            gn_groups=_cfg(gh.get('norm_cfg')).get('num_groups', 36))
        return GridRoIHead(
            grid_head_module=head,
            grid_roi_out=_cfg(grid_extractor.get('roi_layer')).get(
                'output_size', 14),
            pos_radius=rcnn_train.get('pos_radius', 1),
            **common)
    if t == 'DynamicRoIHead':
        from .dynamic_rcnn import DynamicRoIHead
        dyn = _cfg(rcnn_train.get('dynamic_rcnn'))
        return DynamicRoIHead(
            iou_topk=dyn.get('iou_topk', 75),
            beta_topk=dyn.get('beta_topk', 10),
            initial_iou=dyn.get('initial_iou', 0.4),
            initial_beta=dyn.get('initial_beta', 1.0),
            update_iter_interval=dyn.get('update_iter_interval', 100),
            **common)
    if t == 'DynaMaskRoIHead':
        from .dynamask_roi_head import build_dynamask_roi_head
        return build_dynamask_roi_head(cfg, rcnn_train, rcnn_test, common)
    if t in ('RefineRoIHead', 'SimpleRefineRoIHead'):
        from .refine_mask_head import (RefineMaskHead, RefineRoIHead,
                                       SimpleRefineMaskHead,
                                       SimpleRefineRoIHead)
        mhc = _cfg(cfg['mask_head'])
        mt = mhc.pop('type')
        assert mt in ('RefineMaskHead', 'SimpleRefineMaskHead'), mt
        loss_cfg = _cfg(mhc.pop('loss_cfg', {}))
        mh_common = dict(
            num_convs_instance=mhc.get('num_convs_instance', 2),
            num_convs_semantic=mhc.get('num_convs_semantic', 4),
            conv_out_channels_instance=mhc.get('conv_out_channels_instance',
                                               256),
            conv_out_channels_semantic=mhc.get('conv_out_channels_semantic',
                                               256),
            semantic_out_stride=mhc.get('semantic_out_stride', 4),
            dilations=tuple(mhc.get('dilations', (1, 3, 5))),
            stage_num_classes=tuple(mhc.get('stage_num_classes',
                                            (80, 80, 80, 80))),
            stage_sup_size=tuple(mhc.get('stage_sup_size',
                                         (14, 28, 56, 112))))
        if mt == 'SimpleRefineMaskHead':
            mask_head = SimpleRefineMaskHead(
                fusion_type=mhc.get('fusion_type', 'MultiBranchFusionAvg'),
                pre_upsample_last_stage=mhc.get('pre_upsample_last_stage',
                                                False),
                **mh_common)
        else:
            mask_head = RefineMaskHead(
                fusion_type=mhc.get('fusion_type', 'MultiBranchFusion'),
                mask_use_sigmoid=mhc.get('mask_use_sigmoid', False),
                **mh_common)
        cls = RefineRoIHead if t == 'RefineRoIHead' else SimpleRefineRoIHead
        return cls(
            mask_head=mask_head,
            stage_sup_size=tuple(mhc.get('stage_sup_size',
                                         (14, 28, 56, 112))),
            stage_instance_loss_weight=tuple(
                loss_cfg.get('stage_instance_loss_weight',
                             (0.25, 0.5, 0.75, 1.0))),
            semantic_loss_weight=loss_cfg.get('semantic_loss_weight', 1.0),
            boundary_width=loss_cfg.get('boundary_width', 2),
            start_stage=loss_cfg.get('start_stage', 1),
            **common)
    if t == 'PointRendRoIHead':
        from .point_rend import (PointRendRoIHead, CoarseMaskHead,
                                 MaskPointHead)
        mhc = _cfg(cfg['mask_head'])
        assert mhc.pop('type') == 'CoarseMaskHead'
        mask_head = CoarseMaskHead(
            num_convs=mhc.get('num_convs', 0),
            num_fcs=mhc.get('num_fcs', 2),
            in_channels=mhc.get('in_channels', 256),
            conv_out_channels=mhc.get('conv_out_channels', 256),
            fc_out_channels=mhc.get('fc_out_channels', 1024),
            downsample_factor=mhc.get('downsample_factor', 2),
            roi_feat_size=mhc.get('roi_feat_size', 14),
            num_classes=mhc.get('num_classes', 80))
        phc = _cfg(cfg['point_head'])
        assert phc.pop('type') == 'MaskPointHead'
        point_head = MaskPointHead(
            num_classes=phc.get('num_classes', 80),
            num_fcs=phc.get('num_fcs', 3),
            in_channels=phc.get('in_channels', 256),
            fc_channels=phc.get('fc_channels', 256),
            class_agnostic=phc.get('class_agnostic', False),
            coarse_pred_each_layer=phc.get('coarse_pred_each_layer', True))
        common['loss_mask_weight'] = _cfg(
            mhc.get('loss_mask')).get('loss_weight', 1.0)
        return PointRendRoIHead(
            mask_head=mask_head, point_head=point_head,
            num_points=rcnn_train.get('num_points', 196),
            oversample_ratio=rcnn_train.get('oversample_ratio', 3.0),
            importance_sample_ratio=rcnn_train.get('importance_sample_ratio',
                                                   0.75),
            subdivision_steps=rcnn_test.get('subdivision_steps', 5),
            subdivision_num_points=rcnn_test.get('subdivision_num_points',
                                                 784),
            scale_factor=rcnn_test.get('scale_factor', 2),
            **common)
    if t == 'HybridTaskCascadeRoIHead':
        from .htc import build_htc_roi_head
        return build_htc_roi_head(cfg, train_cfg, test_cfg, common,
                                  build_bbox_head, _cfg)
    if t == 'CascadeRoIHead':
        from .cascade_roi_head import CascadeRoIHead
        heads, coders = [], []
        for hc in cfg['bbox_head']:
            h, coder_i, _, _ = build_bbox_head(hc)
            heads.append(h)
            coders.append(coder_i)
        mask_head = None
        if cfg.get('mask_head'):
            mhc = _cfg(cfg['mask_head'])
            mt = mhc.pop('type')
            assert mt == 'FCNMaskHead', mt
            mnorm = _cfg(mhc.get('norm_cfg'))
            mask_head = FCNMaskHead(
                num_convs=mhc.get('num_convs', 4),
                in_channels=mhc.get('in_channels', 256),
                conv_out_channels=mhc.get('conv_out_channels', 256),
                num_classes=mhc.get('num_classes', 80),
                class_agnostic=mhc.get('class_agnostic', False),
                norm='gn' if mnorm.get('type') == 'GN' else None,
                gn_groups=mnorm.get('num_groups', 32),
                upsample_type=_cfg(mhc.get('upsample_cfg')).get(
                    'type', 'deconv'))
        stage_assigners = [_cfg(s.get('assigner')) for s in
                           (train_cfg.get('rcnn') or [])] if isinstance(
            train_cfg.get('rcnn'), (list, tuple)) else []
        num_stages = cfg.get('num_stages', len(heads))
        common2 = dict(common)
        common2.pop('bbox_head')
        common2.pop('target_stds')
        return CascadeRoIHead(
            bbox_head=tuple(heads),
            mask_head=mask_head,
            num_stages=num_stages,
            stage_loss_weights=tuple(cfg.get('stage_loss_weights',
                                             (1.0, 0.5, 0.25))),
            stage_pos_iou_thr=tuple(
                a.get('pos_iou_thr', thr) for a, thr in zip(
                    stage_assigners, (0.5, 0.6, 0.7))) if stage_assigners
            else (0.5, 0.6, 0.7),
            stage_target_stds=tuple(tuple(c.get('target_stds',
                                                (0.1, 0.1, 0.2, 0.2)))
                                    for c in coders),
            **common2)
    if t == 'PointRefineRoIHead':
        from .point_refine_head import PointRefineRoIHead, PointRefineMaskHead
        mhc = _cfg(cfg['mask_head'])
        assert mhc.pop('type') == 'PointRefineMaskHead'
        loss_cfg = _cfg(mhc.pop('loss_cfg', {}))
        mask_head = PointRefineMaskHead(
            num_convs_instance=mhc.get('num_convs_instance', 2),
            num_convs_semantic=mhc.get('num_convs_semantic', 4),
            num_fcs=mhc.get('num_fcs', 3),
            conv_out_channels_instance=mhc.get('conv_out_channels_instance',
                                               256),
            conv_out_channels_semantic=mhc.get('conv_out_channels_semantic',
                                               256),
            semantic_out_stride=mhc.get('semantic_out_stride', 4),
            mask_use_sigmoid=mhc.get('mask_use_sigmoid', False),
            coarse_pred_each_layer=mhc.get('coarse_pred_each_layer', True),
            stage_num_classes=tuple(mhc.get('stage_num_classes',
                                            (80, 80, 80, 80))),
            stage_sup_size=tuple(mhc.get('stage_sup_size',
                                         (14, 28, 56, 112))),
            num_points=mhc.get('num_points', 196))
        return PointRefineRoIHead(
            mask_head=mask_head,
            stage_sup_size=tuple(mhc.get('stage_sup_size',
                                         (14, 28, 56, 112))),
            stage_instance_loss_weight=tuple(
                loss_cfg.get('stage_instance_loss_weight', (0.5,) * 4)),
            semantic_loss_weight=loss_cfg.get('semantic_loss_weight', 1.0),
            detail_loss_weight=loss_cfg.get('detail_loss_weight', 1.0),
            boundary_width=loss_cfg.get('boundary_width', 2),
            start_stage=loss_cfg.get('start_stage', 4),
            **common)
    raise KeyError(f'unsupported roi head {t}')


def build_single_stage(t: str, cfg: dict, train_cfg: dict, test_cfg: dict):
    from .single_stage import RetinaNet, SingleStageDetector, RetinaHead
    hc_probe = _cfg(cfg['bbox_head'])
    if hc_probe.get('type') in ('SSDHead', 'PISASSDHead'):
        return build_ssd(cfg, _cfg(train_cfg), _cfg(test_cfg))
    backbone = build_backbone(cfg['backbone'])
    neck = build_neck(cfg['neck'])
    hc = _cfg(cfg['bbox_head'])
    ht = hc.pop('type')
    if ht == 'FreeAnchorRetinaHead':
        from .freeanchor import FreeAnchor
        anchor_cfg = _cfg(hc.get('anchor_generator'))
        coder = _cfg(hc.get('bbox_coder'))
        ratios = tuple(anchor_cfg.get('ratios', (0.5, 1.0, 2.0)))
        spo = anchor_cfg.get('scales_per_octave', 3)
        head = RetinaHead(num_classes=hc.get('num_classes', 80),
                          in_channels=hc.get('in_channels', 256),
                          feat_channels=hc.get('feat_channels', 256),
                          stacked_convs=hc.get('stacked_convs', 4),
                          num_anchors=len(ratios) * spo)
        tc = _cfg(test_cfg)
        lb = _cfg(hc.get('loss_bbox'))
        return FreeAnchor(
            backbone=backbone, neck=neck, bbox_head=head,
            num_classes=hc.get('num_classes', 80),
            anchor_octave_base_scale=anchor_cfg.get('octave_base_scale', 4),
            anchor_scales_per_octave=spo,
            anchor_ratios=ratios,
            anchor_strides=tuple(anchor_cfg.get('strides',
                                                (8, 16, 32, 64, 128))),
            target_means=tuple(coder.get('target_means',
                                         (0., 0., 0., 0.))),
            target_stds=tuple(coder.get('target_stds',
                                        (0.1, 0.1, 0.2, 0.2))),
            pre_anchor_topk=hc.get('pre_anchor_topk', 50),
            bbox_thr=hc.get('bbox_thr', 0.6),
            fa_gamma=hc.get('gamma', 2.0),
            fa_alpha=hc.get('alpha', 0.5),
            smoothl1_beta=lb.get('beta', 0.11),
            loss_bbox_weight=lb.get('loss_weight', 0.75),
            nms_pre=tc.get('nms_pre', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.5),
            max_per_img=tc.get('max_per_img', 100))
    if ht == 'GARetinaHead':
        from .guided_anchor import GARetinaHead, GARetinaNet
        approx_cfg = _cfg(hc.get('approx_anchor_generator'))
        coder = _cfg(hc.get('anchor_coder'))
        tr = _cfg(train_cfg)
        ga_as = _cfg(tr.get('ga_assigner'))
        ga_sm = _cfg(tr.get('ga_sampler'))
        asg = _cfg(tr.get('assigner'))
        tc = _cfg(test_cfg)
        head = GARetinaHead(
            num_classes=hc.get('num_classes', 80),
            feat_channels=hc.get('feat_channels', 256),
            stacked_convs=hc.get('stacked_convs', 4),
            deform_groups=hc.get('deform_groups', 4))
        return GARetinaNet(
            backbone=backbone, neck=neck, bbox_head=head,
            num_classes=hc.get('num_classes', 80),
            octave_base_scale=approx_cfg.get('octave_base_scale', 4),
            scales_per_octave=approx_cfg.get('scales_per_octave', 3),
            anchor_ratios=tuple(approx_cfg.get('ratios', (0.5, 1.0, 2.0))),
            anchor_strides=tuple(approx_cfg.get('strides',
                                                (8, 16, 32, 64, 128))),
            target_stds=tuple(coder.get('target_stds', (1., 1., 1., 1.))),
            ga_pos_iou_thr=ga_as.get('pos_iou_thr', 0.5),
            ga_neg_iou_thr=ga_as.get('neg_iou_thr', 0.4),
            ga_min_pos_iou=ga_as.get('min_pos_iou', 0.4),
            ga_sample_num=ga_sm.get('num', 256),
            ga_pos_fraction=ga_sm.get('pos_fraction', 0.5),
            pos_iou_thr=asg.get('pos_iou_thr', 0.5),
            neg_iou_thr=asg.get('neg_iou_thr', 0.5),
            min_pos_iou=asg.get('min_pos_iou', 0.0),
            center_ratio=tr.get('center_ratio', 0.2),
            ignore_ratio=tr.get('ignore_ratio', 0.5),
            smoothl1_beta=_cfg(hc.get('loss_bbox')).get('beta', 0.04),
            shape_beta=_cfg(hc.get('loss_shape')).get('beta', 0.2),
            loc_filter_thr=hc.get('loc_filter_thr', 0.01),
            nms_pre=tc.get('nms_pre', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.5),
            max_per_img=tc.get('max_per_img', 100))
    assert ht in ('RetinaHead', 'RetinaSepBNHead', 'PISARetinaHead'), ht
    anchor_cfg = _cfg(hc.get('anchor_generator'))
    coder = _cfg(hc.get('bbox_coder'))
    loss_cls = _cfg(hc.get('loss_cls'))
    ratios = tuple(anchor_cfg.get('ratios', (0.5, 1.0, 2.0)))
    spo = anchor_cfg.get('scales_per_octave', 3)
    if ht == 'RetinaSepBNHead':
        from .single_stage import RetinaSepBNHead
        head = RetinaSepBNHead(num_classes=hc.get('num_classes', 80),
                               num_ins=hc.get('num_ins', 5),
                               in_channels=hc.get('in_channels', 256),
                               feat_channels=hc.get('feat_channels', 256),
                               stacked_convs=hc.get('stacked_convs', 4),
                               num_anchors=len(ratios) * spo)
    else:
        head = RetinaHead(num_classes=hc.get('num_classes', 80),
                          in_channels=hc.get('in_channels', 256),
                          feat_channels=hc.get('feat_channels', 256),
                          stacked_convs=hc.get('stacked_convs', 4),
                          num_anchors=len(ratios) * spo)
    assigner = _cfg(_cfg(train_cfg).get('assigner'))
    tc = _cfg(test_cfg)
    cls = RetinaNet if t == 'RetinaNet' else SingleStageDetector
    extra = {}
    # configs/legacy_1.x: v1.x anchors + coder
    if ('Legacy' in anchor_cfg.get('type', '') or
            'Legacy' in _cfg(hc.get('bbox_coder')).get('type', '')):
        extra['legacy'] = True
    # configs/ghm: GHM-C / GHM-R replace focal / L1
    loss_bbox = _cfg(hc.get('loss_bbox'))
    if loss_cls.get('type') == 'GHMC':
        extra.update(cls_loss_type='ghmc',
                     ghm_c_bins=loss_cls.get('bins', 30),
                     loss_cls_weight=loss_cls.get('loss_weight', 1.0))
    if loss_bbox.get('type') == 'GHMR':
        extra.update(reg_loss_type='ghmr',
                     ghm_r_bins=loss_bbox.get('bins', 10),
                     ghm_mu=loss_bbox.get('mu', 0.02),
                     loss_bbox_weight=loss_bbox.get('loss_weight', 10.0))
    if loss_bbox.get('type') == 'BalancedL1Loss':
        # configs/libra_rcnn/libra_retinanet
        extra.update(reg_loss_type='balanced_l1',
                     loss_bbox_weight=loss_bbox.get('loss_weight', 1.0))
    if ht == 'PISARetinaHead':
        from .pisa import PISARetinaNet
        cls = PISARetinaNet
        tr = _cfg(train_cfg)
        isr = _cfg(tr.get('isr'))
        carl = _cfg(tr.get('carl'))
        extra = dict(isr_k=isr.get('k', 2.0), isr_bias=isr.get('bias', 0.0),
                     carl_k=carl.get('k', 1.0),
                     carl_bias=carl.get('bias', 0.2),
                     carl_beta=_cfg(hc.get('loss_bbox')).get('beta', 0.11))
    return cls(
        **extra,
        backbone=backbone, neck=neck, bbox_head=head,
        num_classes=hc.get('num_classes', 80),
        anchor_octave_base_scale=anchor_cfg.get('octave_base_scale', 4),
        anchor_scales_per_octave=spo,
        anchor_ratios=ratios,
        anchor_strides=tuple(anchor_cfg.get('strides', (8, 16, 32, 64, 128))),
        target_means=tuple(coder.get('target_means', (0., 0., 0., 0.))),
        target_stds=tuple(coder.get('target_stds', (1., 1., 1., 1.))),
        pos_iou_thr=assigner.get('pos_iou_thr', 0.5),
        neg_iou_thr=assigner.get('neg_iou_thr', 0.4),
        min_pos_iou=assigner.get('min_pos_iou', 0.0),
        focal_gamma=loss_cls.get('gamma', 2.0),
        focal_alpha=loss_cls.get('alpha', 0.25),
        nms_pre=tc.get('nms_pre', 1000),
        score_thr=tc.get('score_thr', 0.05),
        nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.5),
        max_per_img=tc.get('max_per_img', 100))


def build_ssd(cfg: dict, train_cfg: dict, test_cfg: dict):
    """SSD from the reference schema (configs/_base_/models/ssd300.py)."""
    from .ssd import SSD, SSDVGG, SSDHead
    bc = _cfg(cfg['backbone'])
    assert bc.get('type') == 'SSDVGG', bc.get('type')
    input_size = bc.get('input_size', 300)
    backbone = SSDVGG(input_size=input_size, depth=bc.get('depth', 16))
    hc = _cfg(cfg['bbox_head'])
    anchor_cfg = _cfg(hc.get('anchor_generator'))
    coder = _cfg(hc.get('bbox_coder'))
    ratios = tuple(tuple(r) for r in anchor_cfg.get(
        'ratios', ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))))
    # anchors per level: 2 (1 + sqrt extra) + 2 per extra ratio
    num_anchors = tuple(2 + 2 * len(r) for r in ratios)
    head = SSDHead(num_classes=hc.get('num_classes', 80),
                   num_anchors=num_anchors)
    assigner = _cfg(train_cfg.get('assigner'))
    tc = _cfg(test_cfg)
    extra = {}
    cls = SSD
    if ('Legacy' in anchor_cfg.get('type', '') or
            'Legacy' in coder.get('type', '')):
        extra['legacy'] = True
    if hc.get('type') == 'PISASSDHead':
        from .pisa import PISASSD
        cls = PISASSD
        isr = _cfg(train_cfg.get('isr'))
        carl = _cfg(train_cfg.get('carl'))
        extra = dict(isr_k=isr.get('k', 2.0), isr_bias=isr.get('bias', 0.0),
                     carl_k=carl.get('k', 1.0),
                     carl_bias=carl.get('bias', 0.2))
    return cls(
        **extra,
        backbone=backbone, bbox_head=head,
        num_classes=hc.get('num_classes', 80),
        input_size=input_size,
        strides=tuple(anchor_cfg.get('strides',
                                     (8, 16, 32, 64, 100, 300))),
        ratios=ratios,
        basesize_ratio_range=tuple(anchor_cfg.get('basesize_ratio_range',
                                                  (0.15, 0.9))),
        target_means=tuple(coder.get('target_means', (0., 0., 0., 0.))),
        target_stds=tuple(coder.get('target_stds', (0.1, 0.1, 0.2, 0.2))),
        pos_iou_thr=assigner.get('pos_iou_thr', 0.5),
        neg_iou_thr=assigner.get('neg_iou_thr', 0.5),
        min_pos_iou=assigner.get('min_pos_iou', 0.2),
        neg_pos_ratio=train_cfg.get('neg_pos_ratio', 3),
        smoothl1_beta=train_cfg.get('smoothl1_beta', 1.0),
        nms_pre=tc.get('nms_pre', 1000),
        score_thr=tc.get('score_thr', 0.02),
        nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.45),
        max_per_img=tc.get('max_per_img', 200))


def _build_ga_rpn_family(cfg, train_cfg, test_cfg, with_roi: bool):
    # GA-Faster / GA-RPN: the reference keeps type FasterRCNN / RPN and
    # swaps the RPN head (configs/guided_anchoring/ga_faster_*.py,
    # ga_rpn_*.py)
    from .guided_anchor import GARPNHead, GAFasterRCNN, GARPN
    hc = _cfg(cfg['rpn_head'])
    approx_cfg = _cfg(hc.get('approx_anchor_generator'))
    coder = _cfg(hc.get('anchor_coder'))
    bcoder = _cfg(hc.get('bbox_coder'))
    tr = _cfg(train_cfg)
    rpn_tr = _cfg(tr.get('rpn'))
    ga_as = _cfg(rpn_tr.get('ga_assigner'))
    ga_sm = _cfg(rpn_tr.get('ga_sampler'))
    asg = _cfg(rpn_tr.get('assigner'))
    smp = _cfg(rpn_tr.get('sampler'))
    rpn_proposal = _cfg(tr.get('rpn_proposal'))
    rpn_test = _cfg(_cfg(test_cfg).get('rpn'))
    det_cls = GAFasterRCNN if with_roi else GARPN
    return det_cls(
        backbone=build_backbone(cfg['backbone']),
        neck=build_neck(cfg['neck']),
        rpn_head=GARPNHead(
            feat_channels=hc.get('feat_channels', 256),
            deform_groups=hc.get('deform_groups', 4)),
        roi_head=(build_roi_head(cfg['roi_head'], _cfg(train_cfg),
                                 _cfg(test_cfg)) if with_roi else None),
        octave_base_scale=approx_cfg.get('octave_base_scale', 8),
        scales_per_octave=approx_cfg.get('scales_per_octave', 3),
        anchor_ratios=tuple(approx_cfg.get('ratios', (0.5, 1.0, 2.0))),
        anchor_strides=tuple(approx_cfg.get('strides',
                                            (4, 8, 16, 32, 64))),
        target_stds=tuple(bcoder.get('target_stds',
                                     (0.07, 0.07, 0.11, 0.11))),
        ga_pos_iou_thr=ga_as.get('pos_iou_thr', 0.7),
        ga_neg_iou_thr=ga_as.get('neg_iou_thr', 0.3),
        ga_min_pos_iou=ga_as.get('min_pos_iou', 0.3),
        ga_sample_num=ga_sm.get('num', 256),
        ga_pos_fraction=ga_sm.get('pos_fraction', 0.5),
        rpn_pos_iou_thr=asg.get('pos_iou_thr', 0.7),
        rpn_neg_iou_thr=asg.get('neg_iou_thr', 0.3),
        rpn_min_pos_iou=asg.get('min_pos_iou', 0.3),
        rpn_num_samples=smp.get('num', 256),
        rpn_pos_fraction=smp.get('pos_fraction', 0.5),
        center_ratio=rpn_tr.get('center_ratio', 0.2),
        ignore_ratio=rpn_tr.get('ignore_ratio', 0.5),
        shape_beta=_cfg(hc.get('loss_shape')).get('beta', 0.2),
        rpn_beta=_cfg(hc.get('loss_bbox')).get('beta', 1.0),
        loc_filter_thr=hc.get('loc_filter_thr', 0.01),
        rpn_nms_pre_train=rpn_proposal.get('nms_pre', 2000),
        rpn_nms_pre_test=rpn_test.get('nms_pre', 1000),
        rpn_max_num=rpn_proposal.get('max_num', 300),
        rpn_nms_thr=rpn_proposal.get('nms_thr', 0.7))


def build_detector(model_cfg: dict, train_cfg: Optional[dict] = None,
                   test_cfg: Optional[dict] = None):
    """Build a detector module from a reference-schema config."""
    cfg = _cfg(model_cfg)
    t = cfg.pop('type')
    cfg.pop('pretrained', None)
    if t in ('RetinaNet', 'SingleStageDetector'):
        return build_single_stage(t, cfg, _cfg(train_cfg), _cfg(test_cfg))
    if t == 'ATSS':
        from .atss import ATSS, ATSSHead
        backbone = build_backbone(cfg['backbone'])
        neck = build_neck(cfg['neck'])
        hc = _cfg(cfg['bbox_head'])
        assert hc.pop('type') == 'ATSSHead'
        anchor_cfg = _cfg(hc.get('anchor_generator'))
        coder = _cfg(hc.get('bbox_coder'))
        strides = tuple(anchor_cfg.get('strides', (8, 16, 32, 64, 128)))
        head = ATSSHead(num_classes=hc.get('num_classes', 80),
                        in_channels=hc.get('in_channels', 256),
                        feat_channels=hc.get('feat_channels', 256),
                        stacked_convs=hc.get('stacked_convs', 4),
                        num_levels=len(strides))
        tc = _cfg(test_cfg)
        trc = _cfg(train_cfg)
        return ATSS(
            backbone=backbone, neck=neck, bbox_head=head,
            num_classes=hc.get('num_classes', 80), strides=strides,
            octave_base_scale=anchor_cfg.get('octave_base_scale', 8),
            anchor_ratios=tuple(anchor_cfg.get('ratios', (1.0,))),
            target_means=tuple(coder.get('target_means', (0., 0., 0., 0.))),
            target_stds=tuple(coder.get('target_stds', (0.1, 0.1, 0.2, 0.2))),
            assigner_topk=_cfg(trc.get('assigner')).get('topk', 9),
            nms_pre=tc.get('nms_pre', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.6),
            max_per_img=tc.get('max_per_img', 100))
    if t == 'RepPointsDetector':
        from .reppoints import RepPointsDetector, RepPointsHead
        backbone = build_backbone(cfg['backbone'])
        neck = build_neck(cfg['neck'])
        hc = _cfg(cfg['bbox_head'])
        assert hc.pop('type') == 'RepPointsHead'
        head = RepPointsHead(
            num_classes=hc.get('num_classes', 80),
            in_channels=hc.get('in_channels', 256),
            feat_channels=hc.get('feat_channels', 256),
            point_feat_channels=hc.get('point_feat_channels', 256),
            stacked_convs=hc.get('stacked_convs', 3),
            num_points=hc.get('num_points', 9),
            gradient_mul=hc.get('gradient_mul', 0.1),
            use_gn=bool(hc.get('norm_cfg')),
            use_grid_points=hc.get('use_grid_points', False),
            point_base_scale=hc.get('point_base_scale', 4))
        tc = _cfg(test_cfg)
        trc = _cfg(train_cfg)
        init_c = _cfg(trc.get('init'))
        refine_c = _cfg(trc.get('refine'))
        return RepPointsDetector(
            backbone=backbone, neck=neck, bbox_head=head,
            num_classes=hc.get('num_classes', 80),
            num_points=hc.get('num_points', 9),
            point_strides=tuple(hc.get('point_strides',
                                       (8, 16, 32, 64, 128))),
            point_base_scale=hc.get('point_base_scale', 4),
            moment_mul=hc.get('moment_mul', 0.01),
            transform_method=hc.get('transform_method', 'moment'),
            init_assign_scale=_cfg(init_c.get('assigner')).get('scale', 4),
            init_pos_num=_cfg(init_c.get('assigner')).get('pos_num', 1),
            refine_pos_iou=_cfg(refine_c.get('assigner')).get(
                'pos_iou_thr', 0.5),
            refine_neg_iou=_cfg(refine_c.get('assigner')).get(
                'neg_iou_thr', 0.4),
            loss_init_weight=_cfg(hc.get('loss_bbox_init')).get(
                'loss_weight', 0.5),
            loss_refine_weight=_cfg(hc.get('loss_bbox_refine')).get(
                'loss_weight', 1.0),
            smoothl1_beta=_cfg(hc.get('loss_bbox_init')).get('beta',
                                                             1.0 / 9.0),
            nms_pre=tc.get('nms_pre', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.5),
            max_per_img=tc.get('max_per_img', 100))
    if t == 'FOVEA':
        from .fovea import FOVEA, FoveaHead
        backbone = build_backbone(cfg['backbone'])
        neck = build_neck(cfg['neck'])
        hc = _cfg(cfg['bbox_head'])
        assert hc.pop('type') == 'FoveaHead'
        hnorm = _cfg(hc.get('norm_cfg'))
        head = FoveaHead(num_classes=hc.get('num_classes', 80),
                         in_channels=hc.get('in_channels', 256),
                         feat_channels=hc.get('feat_channels', 256),
                         stacked_convs=hc.get('stacked_convs', 4),
                         with_deform=hc.get('with_deform', False),
                         deform_groups=hc.get('deform_groups', 4),
                         norm='gn' if hnorm.get('type') == 'GN' else None,
                         gn_groups=hnorm.get('num_groups', 32))
        tc = _cfg(test_cfg)
        return FOVEA(
            backbone=backbone, neck=neck, bbox_head=head,
            num_classes=hc.get('num_classes', 80),
            strides=tuple(hc.get('strides', (8, 16, 32, 64, 128))),
            base_edge_list=tuple(hc.get('base_edge_list',
                                        (16, 32, 64, 128, 256))),
            scale_ranges=tuple(tuple(r) for r in hc.get(
                'scale_ranges',
                ((8, 32), (16, 64), (32, 128), (64, 256), (128, 512)))),
            sigma=hc.get('sigma', 0.4),
            focal_gamma=_cfg(hc.get('loss_cls')).get('gamma', 2.0),
            focal_alpha=_cfg(hc.get('loss_cls')).get('alpha', 0.25),
            smoothl1_beta=_cfg(hc.get('loss_bbox')).get('beta', 0.11),
            loss_bbox_weight=_cfg(hc.get('loss_bbox')).get('loss_weight',
                                                           1.0),
            nms_pre=tc.get('nms_pre', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.5),
            max_per_img=tc.get('max_per_img', 100))
    if t == 'FSAF':
        from .fsaf import FSAF
        from .single_stage import RetinaHead
        backbone = build_backbone(cfg['backbone'])
        neck = build_neck(cfg['neck'])
        hc = _cfg(cfg['bbox_head'])
        assert hc.pop('type') == 'FSAFHead'
        anchor_cfg = _cfg(hc.get('anchor_generator'))
        strides = tuple(anchor_cfg.get('strides', (8, 16, 32, 64, 128)))
        head = RetinaHead(num_classes=hc.get('num_classes', 80),
                          in_channels=hc.get('in_channels', 256),
                          feat_channels=hc.get('feat_channels', 256),
                          stacked_convs=hc.get('stacked_convs', 4),
                          num_anchors=1)
        tc = _cfg(test_cfg)
        trc = _cfg(train_cfg)
        ac = _cfg(trc.get('assigner'))
        return FSAF(
            backbone=backbone, neck=neck, bbox_head=head,
            num_classes=hc.get('num_classes', 80), strides=strides,
            tblr_normalizer=_cfg(hc.get('bbox_coder')).get('normalizer',
                                                           4.0),
            pos_scale=ac.get('pos_scale', 0.2),
            neg_scale=ac.get('neg_scale', 0.2),
            min_pos_iof=ac.get('min_pos_iof', 0.01),
            nms_pre=tc.get('nms_pre', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.5),
            max_per_img=tc.get('max_per_img', 100))
    if t == 'CornerNet':
        from .cornernet import CornerNet, CornerHead
        backbone = build_backbone(cfg['backbone'])
        hc = _cfg(cfg['bbox_head'])
        assert hc.pop('type') == 'CornerHead'
        head = CornerHead(
            num_classes=hc.get('num_classes', 80),
            in_channels=hc.get('in_channels', 256),
            num_feat_levels=hc.get('num_feat_levels', 2),
            corner_emb_channels=hc.get('corner_emb_channels', 1))
        tc = _cfg(test_cfg)
        emb = _cfg(hc.get('loss_embedding'))
        return CornerNet(
            backbone=backbone, bbox_head=head,
            num_classes=hc.get('num_classes', 80),
            pull_weight=emb.get('pull_weight', 0.25),
            push_weight=emb.get('push_weight', 0.25),
            offset_beta=_cfg(hc.get('loss_offset')).get('beta', 1.0),
            corner_topk=tc.get('corner_topk', 100),
            local_maximum_kernel=tc.get('local_maximum_kernel', 3),
            distance_threshold=tc.get('distance_threshold', 0.5),
            num_dets=tc.get('num_dets', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms_cfg')).get('iou_threshold', 0.5),
            max_per_img=tc.get('max_per_img', 100))
    if t == 'GFL':
        from .gfl import GFL, GFLHead
        backbone = build_backbone(cfg['backbone'])
        neck = build_neck(cfg['neck'])
        hc = _cfg(cfg['bbox_head'])
        assert hc.pop('type') == 'GFLHead'
        anchor_cfg = _cfg(hc.get('anchor_generator'))
        strides = tuple(anchor_cfg.get('strides', (8, 16, 32, 64, 128)))
        reg_max = hc.get('reg_max', 16)
        head = GFLHead(num_classes=hc.get('num_classes', 80),
                       in_channels=hc.get('in_channels', 256),
                       feat_channels=hc.get('feat_channels', 256),
                       stacked_convs=hc.get('stacked_convs', 4),
                       num_levels=len(strides), reg_max=reg_max)
        tc = _cfg(test_cfg)
        trc = _cfg(train_cfg)
        return GFL(
            backbone=backbone, neck=neck, bbox_head=head,
            num_classes=hc.get('num_classes', 80), strides=strides,
            octave_base_scale=anchor_cfg.get('octave_base_scale', 8),
            anchor_ratios=tuple(anchor_cfg.get('ratios', (1.0,))),
            reg_max=reg_max,
            assigner_topk=_cfg(trc.get('assigner')).get('topk', 9),
            loss_dfl_weight=_cfg(hc.get('loss_dfl')).get('loss_weight',
                                                         0.25),
            loss_bbox_weight=_cfg(hc.get('loss_bbox')).get('loss_weight',
                                                           2.0),
            nms_pre=tc.get('nms_pre', 1000),
            score_thr=tc.get('score_thr', 0.05),
            nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.6),
            max_per_img=tc.get('max_per_img', 100))
    if t in ('FCOS', 'NASFCOS'):
        from .fcos import FCOS, FCOSHead
        backbone = build_backbone(cfg['backbone'])
        neck = build_neck(cfg['neck'])
        hc = _cfg(cfg['bbox_head'])
        ht = hc.pop('type')
        strides = tuple(hc.get('strides', (8, 16, 32, 64, 128)))
        if ht == 'NASFCOSHead':
            from .nasfcos import NASFCOSHead
            head = NASFCOSHead(num_classes=hc.get('num_classes', 80),
                               feat_channels=hc.get('feat_channels', 256),
                               strides=strides,
                               gn_groups=_cfg(hc.get('norm_cfg')).get(
                                   'num_groups', 32))
        else:
            assert ht == 'FCOSHead', ht
            hnorm = _cfg(hc.get('norm_cfg'))
            head = FCOSHead(num_classes=hc.get('num_classes', 80),
                            in_channels=hc.get('in_channels', 256),
                            feat_channels=hc.get('feat_channels', 256),
                            stacked_convs=hc.get('stacked_convs', 4),
                            strides=strides,
                            norm='gn' if hnorm.get('type') == 'GN' else None,
                            gn_groups=hnorm.get('num_groups', 32),
                            centerness_on_reg=hc.get('centerness_on_reg',
                                                     False),
                            norm_on_bbox=hc.get('norm_on_bbox', False),
                            dcn_on_last_conv=hc.get('dcn_on_last_conv',
                                                    False))
        tc = _cfg(test_cfg)
        if t == 'NASFCOS':
            from .nasfcos import NASFCOS
            FCOS = NASFCOS
        lb = _cfg(hc.get('loss_bbox'))
        return FCOS(backbone=backbone, neck=neck, bbox_head=head,
                    num_classes=hc.get('num_classes', 80), strides=strides,
                    regress_ranges=tuple(tuple(r) for r in hc.get(
                        'regress_ranges',
                        ((-1, 64), (64, 128), (128, 256), (256, 512),
                         (512, 1e8)))),
                    center_sampling=hc.get('center_sampling', False),
                    center_sample_radius=hc.get('center_sample_radius', 1.5),
                    reg_loss_mode=('log_iou'
                                   if lb.get('type') == 'IoULoss'
                                   else 'giou'),
                    nms_pre=tc.get('nms_pre', 1000),
                    score_thr=tc.get('score_thr', 0.05),
                    nms_iou_thr=_cfg(tc.get('nms')).get('iou_threshold', 0.5),
                    max_per_img=tc.get('max_per_img', 100))
    if t == 'FastRCNN':
        from .detectors import FastRCNN
        return FastRCNN(
            backbone=build_backbone(cfg['backbone']),
            neck=build_neck(cfg['neck']),
            roi_head=build_roi_head(cfg['roi_head'], _cfg(train_cfg),
                                    _cfg(test_cfg)))
    if t == 'RPN':
        if _cfg(cfg.get('rpn_head')).get('type') == 'GARPNHead':
            return _build_ga_rpn_family(cfg, train_cfg, test_cfg,
                                        with_roi=False)
        from .detectors import RPN
        rpn_head, anchor_cfg, rpn_coder, rpn_loss_cls, rpn_loss_bbox = \
            build_rpn_head(cfg['rpn_head'])
        rpn_train = _cfg(_cfg(train_cfg).get('rpn'))
        rpn_test = _cfg(_cfg(test_cfg).get('rpn'))
        rpn_assigner = _cfg(rpn_train.get('assigner'))
        rpn_sampler = _cfg(rpn_train.get('sampler'))
        return RPN(
            backbone=build_backbone(cfg['backbone']),
            neck=build_neck(cfg['neck']) if cfg.get('neck') else None,
            rpn_head=rpn_head,
            anchor_scales=tuple(anchor_cfg.get('scales', (8,))),
            anchor_ratios=tuple(anchor_cfg.get('ratios', (0.5, 1.0, 2.0))),
            anchor_strides=tuple(anchor_cfg.get('strides',
                                                (4, 8, 16, 32, 64))),
            rpn_target_means=tuple(rpn_coder.get('target_means',
                                                 (0., 0., 0., 0.))),
            rpn_target_stds=tuple(rpn_coder.get('target_stds',
                                                (1., 1., 1., 1.))),
            rpn_pos_iou_thr=rpn_assigner.get('pos_iou_thr', 0.7),
            rpn_neg_iou_thr=rpn_assigner.get('neg_iou_thr', 0.3),
            rpn_min_pos_iou=rpn_assigner.get('min_pos_iou', 0.3),
            rpn_num_samples=rpn_sampler.get('num', 256),
            rpn_pos_fraction=rpn_sampler.get('pos_fraction', 0.5),
            rpn_nms_pre_test=rpn_test.get('nms_pre', 2000),
            rpn_max_num=rpn_test.get('max_num',
                                     rpn_test.get('nms_post', 2000)),
            rpn_nms_thr=rpn_test.get('nms_thr', 0.7),
            rpn_cls_weight=rpn_loss_cls.get('loss_weight', 1.0),
            rpn_bbox_weight=rpn_loss_bbox.get('loss_weight', 1.0))
    if _cfg(cfg.get('rpn_head')).get('type') == 'GARPNHead':
        return _build_ga_rpn_family(cfg, train_cfg, test_cfg, with_roi=True)
    det_cls = {'MaskRCNN': MaskRCNN, 'FasterRCNN': FasterRCNN,
               'TwoStageDetector': TwoStageDetector,
               'GridRCNN': TwoStageDetector,
               'CascadeRCNN': TwoStageDetector,
               'HybridTaskCascade': TwoStageDetector,
               'PointRend': TwoStageDetector,
               'MaskScoringRCNN': TwoStageDetector}.get(t)
    if det_cls is None:
        raise KeyError(f'unsupported detector {t}')

    backbone = build_backbone(cfg['backbone'])
    neck = build_neck(cfg.get('neck'))
    rpn_head, anchor_cfg, rpn_coder, rpn_loss_cls, rpn_loss_bbox = \
        build_rpn_head(cfg['rpn_head'])
    roi_head = build_roi_head(cfg['roi_head'], _cfg(train_cfg), _cfg(test_cfg))

    rpn_train = _cfg(_cfg(train_cfg).get('rpn'))
    rpn_proposal = _cfg(_cfg(train_cfg).get('rpn_proposal'))
    rpn_test = _cfg(_cfg(test_cfg).get('rpn'))
    rpn_assigner = _cfg(rpn_train.get('assigner'))
    rpn_sampler = _cfg(rpn_train.get('sampler'))

    return det_cls(
        backbone=backbone, neck=neck, rpn_head=rpn_head, roi_head=roi_head,
        anchor_scales=tuple(anchor_cfg.get('scales', (8,))),
        anchor_ratios=tuple(anchor_cfg.get('ratios', (0.5, 1.0, 2.0))),
        anchor_strides=tuple(anchor_cfg.get('strides', (4, 8, 16, 32, 64))),
        rpn_target_means=tuple(rpn_coder.get('target_means', (0., 0., 0., 0.))),
        rpn_target_stds=tuple(rpn_coder.get('target_stds', (1., 1., 1., 1.))),
        rpn_pos_iou_thr=rpn_assigner.get('pos_iou_thr', 0.7),
        rpn_neg_iou_thr=rpn_assigner.get('neg_iou_thr', 0.3),
        rpn_min_pos_iou=rpn_assigner.get('min_pos_iou', 0.3),
        rpn_num_samples=rpn_sampler.get('num', 256),
        rpn_pos_fraction=rpn_sampler.get('pos_fraction', 0.5),
        rpn_nms_pre_train=rpn_proposal.get('nms_pre', 2000),
        rpn_nms_pre_test=rpn_test.get('nms_pre', 1000),
        rpn_max_num=rpn_proposal.get('max_num', 1000),
        rpn_nms_thr=rpn_proposal.get('nms_thr', 0.7),
        rpn_cls_weight=rpn_loss_cls.get('loss_weight', 1.0),
        rpn_bbox_weight=rpn_loss_bbox.get('loss_weight', 1.0),
    )
