"""Native 2D instance segmentation (Mask R-CNN family) in flax.

Replaces the reference's vendored mmdetection HTC model
(see/detector2d/mmdetection, used only through init_detector /
inference_detector in see/detector2d/generate_masks.py:67-141) with a
TPU-native two-stage detector: ResNet-FPN backbone, RPN, ROIAlign as
batched bilinear gathers, box + mask heads. Deformable convolution (HTC's
DCN backbone) is replaced by standard convolution — documented deviation;
the COCO-JSON mask contract is identical so outputs are drop-in for the
SEE pipeline (see/masks.py CocoMasks).
"""
from .maskrcnn import MaskRCNN, MaskRCNNLogic, Seg2DConfig  # noqa: F401
