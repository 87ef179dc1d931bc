from .layers import ConvModule
from .resnet import ResNet, BasicBlock, Bottleneck
from .fpn import FPN, PAFPN
from .rpn_head import RPNHead, rpn_loss, rpn_get_proposals, Proposals
from .bbox_head import (ConvFCBBoxHead, Shared2FCBBoxHead,
                        Shared4Conv1FCBBoxHead, bbox_targets_from_sample,
                        bbox_head_loss, bbox_head_get_dets)
from .fcn_mask_head import FCNMaskHead, fcn_mask_loss, select_class_channel
from .roi_head import StandardRoIHead
from .dynamask_head import (DynaMaskHead, SFMStage, MaskPre, SEBlock,
                            MultiBranchFusion, DCNPack, gumbel_softmax)
from .dynamask_roi_head import (DynaMaskRoIHead, dyna_mask_loss,
                                flops_budget_loss)
from .detectors import (TwoStageDetector, MaskRCNN, FasterRCNN, parse_losses)
from .builder import build_detector
from . import losses

__all__ = [
    'ConvModule', 'ResNet', 'BasicBlock', 'Bottleneck', 'FPN', 'PAFPN',
    'RPNHead', 'rpn_loss', 'rpn_get_proposals', 'Proposals',
    'ConvFCBBoxHead', 'Shared2FCBBoxHead', 'Shared4Conv1FCBBoxHead',
    'bbox_targets_from_sample', 'bbox_head_loss', 'bbox_head_get_dets',
    'FCNMaskHead', 'fcn_mask_loss', 'select_class_channel',
    'StandardRoIHead', 'TwoStageDetector', 'MaskRCNN', 'FasterRCNN',
    'parse_losses', 'build_detector', 'losses',
    'DynaMaskHead', 'SFMStage', 'MaskPre', 'SEBlock', 'MultiBranchFusion',
    'DCNPack', 'gumbel_softmax', 'DynaMaskRoIHead', 'dyna_mask_loss',
    'flops_budget_loss',
]
