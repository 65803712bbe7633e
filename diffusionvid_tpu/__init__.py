"""diffusionvid_tpu — a TPU-native video object detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of DiffusionVID
(reference: sdroh1027/DiffusionVID): diffusion-based set-prediction video
detection (DiffusionDet/DiffusionVID), the MEGA family of video detectors,
ResNet/Swin backbones, ILSVRC-VID data pipeline, VID evaluation, and a
pjit/shard_map data-parallel runtime.

Design principles (TPU-first):
  * static shapes everywhere — 300 proposals, fixed top-k, fixed-size
    rolling local buffers and global memory, padded ground truth;
  * functional models (flax.linen) + pure-function diffusion schedules;
  * the streaming video loop is a jitted state-carrying step function,
    not a Python object graph;
  * hot ops (ROIAlign, NMS, FPS memory dedup) are Pallas/XLA kernels,
    not CUDA extensions.
"""

__version__ = "0.1.0"
