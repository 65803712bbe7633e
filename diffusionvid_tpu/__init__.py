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

# Restore documented JAX_PLATFORMS semantics: the axon TPU plugin's
# registration hook calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which silently overrides the user's env var —
# JAX_PLATFORMS=cpu would still grab the TPU.  Push the env var's choice
# back after jax loads (tests/conftest.py does the same for the suite).
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
del _os
