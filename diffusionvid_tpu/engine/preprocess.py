"""Device-side frame preprocessing: resize + pad on the TPU.

The reference hides resize/normalize cost inside 16 dataloader worker
processes (``mega_core/data/build.py`` DATALOADER.NUM_WORKERS); on a
host with few cores the per-frame cv2 resize + pad copy (~5-7 ms/frame)
serializes with JPEG decode and caps end-to-end throughput.  Shipping the
RAW decoded uint8 frame (~2.6 MB — about the same bytes as the padded
bucket) and doing resize+pad on device leaves decode as the only host
work.

``jax.image.resize`` with ``method="linear"`` uses half-pixel centers —
the same sampling convention as ``cv2.INTER_LINEAR``
(``data/transforms.py resize_image``); results agree to ~1/255.
Normalization stays inside the model (``DiffusionDetArch.normalize``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def device_resize_pad(raw, target_hw: Tuple[int, int],
                      bucket_hw: Tuple[int, int]):
    """[F, H0, W0, 3] uint8/float → [F, bh, bw, 3] float32.

    Resizes to ``target_hw`` (the maskrcnn short-side/long-side scale
    target computed on host from the ORIGINAL extent) and zero-pads
    bottom/right to the static ``bucket_hw``, exactly mirroring the host
    path ``transform_frame`` (resize → pad).
    """
    f = raw.shape[0]
    rh, rw = target_hw
    bh, bw = bucket_hw
    x = jax.image.resize(raw.astype(jnp.float32), (f, rh, rw, 3), "linear")
    return jnp.pad(x, ((0, 0), (0, bh - rh), (0, bw - rw), (0, 0)))


def make_device_preprocess(height: int, width: int, min_size: int = 600,
                           max_size: int = 1000):
    """Host-side helper: compute this video's (target, bucket) from its
    original extent and return ``fn(raw_batch) -> padded float32 batch``
    plus the whwh vector (resized content extent, [w, h, w, h])."""
    import numpy as np

    from ..data.transforms import frame_bucket, resize_scale

    scale = resize_scale(height, width, min_size, max_size)
    rh, rw = int(round(height * scale)), int(round(width * scale))
    bucket = frame_bucket(height, width, min_size, max_size)
    whwh = np.asarray([rw, rh, rw, rh], np.float32)

    def fn(raw_batch):
        return device_resize_pad(jnp.asarray(raw_batch), (rh, rw), bucket)

    return fn, whwh, bucket
