"""cim_tpu: a TPU-native framework for Complete Instances Mining (CIM).

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA/PyTorch codebase (ZechengLi19/CIM — IJCAI 2023 "Complete Instances
Mining for Weakly Supervised Instance Segmentation"):

- weakly supervised instance segmentation from image-level (or point) labels
  over precomputed COB mask proposals;
- MIL + self-refinement proposal-scoring network (ResNet-50-C4 / dilated
  VGG-16 / HRNet-W48 backbones, MaskFuse box head, cls/iou refinement heads);
- the CIM complete-instance mining step expressed as fixed-shape, jit-able
  XLA ops (no python loops in the hot path);
- pjit/shard_map data-parallel training over a jax.sharding.Mesh;
- multi-scale + flip TTA inference, VOC/COCO evaluation, pseudo-label export.

Layout:
  cim_tpu.ops         geometry / NMS / mask-IoU / RoIAlign (XLA + Pallas)
  cim_tpu.models      backbones + heads (flax.linen)
  cim_tpu.mining      CIM mining + losses (pure functions)
  cim_tpu.data        dataset catalog, roidb, fixed-shape batch pipeline
  cim_tpu.engine      train/eval engines, optimizer, checkpointing
  cim_tpu.evaluation  VOC mAP / CorLoc / COCO / instance-seg metrics
  cim_tpu.native      C++ host-side kernels (eval NMS, bbox overlaps)
"""

__version__ = "0.1.0"
