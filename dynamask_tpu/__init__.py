"""dynamask_tpu — a TPU-native instance-segmentation framework.

A ground-up JAX / XLA / Pallas rebuild with the capabilities of
lslrh/DynaMask (mmdetection-v2-based PyTorch/CUDA): Mask R-CNN family
detectors with DynaMask's multi-stage mask cascade and per-RoI dynamic
resolution routing, re-designed for TPUs — static shapes, fused device-side
pipelines, sharded data-parallel training over a jax Mesh.
"""

__version__ = '0.1.0'
