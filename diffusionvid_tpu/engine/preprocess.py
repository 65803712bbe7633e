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


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def device_yuv420_to_rgb_pad(yuv, enc_hw: Tuple[int, int],
                             target_hw: Tuple[int, int],
                             bucket_hw: Tuple[int, int]):
    """[F, He*3/2, We] packed I420 uint8 → [F, bh, bw, 3] float32 RGB.

    Inverse of ``cv2.COLOR_BGR2YUV_I420``: ITU-R BT.601 video range
    (R = 1.164(Y-16) + 1.596(V-128), etc.) with nearest 2×2 chroma
    upsampling — matches ``cv2.COLOR_YUV2RGB_I420`` to ±1/255 on the
    content region.  ``enc_hw`` is the even-padded encode extent,
    ``target_hw`` the true resized extent (cropped before bucket pad).
    """
    f = yuv.shape[0]
    he, we = enc_hw
    rh, rw = target_hw
    bh, bw = bucket_hw
    flat = yuv.reshape(f, -1)
    ny = he * we
    nc = (he // 2) * (we // 2)
    y = flat[:, :ny].reshape(f, he, we).astype(jnp.float32)
    u = flat[:, ny:ny + nc].reshape(f, he // 2, we // 2).astype(jnp.float32)
    v = flat[:, ny + nc:].reshape(f, he // 2, we // 2).astype(jnp.float32)
    # nearest chroma upsample (cv2's I420 path replicates 2x2)
    u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
    v = jnp.repeat(jnp.repeat(v, 2, axis=1), 2, axis=2)
    yl = 1.164 * (y - 16.0)
    r = yl + 1.596 * (v - 128.0)
    g = yl - 0.813 * (v - 128.0) - 0.391 * (u - 128.0)
    b = yl + 2.018 * (u - 128.0)
    rgb = jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)
    rgb = rgb[:, :rh, :rw]
    return jnp.pad(rgb, ((0, 0), (0, bh - rh), (0, bw - rw), (0, 0)))


def make_yuv_device_preprocess(height: int, width: int, min_size: int = 600,
                               max_size: int = 1000):
    """Minimal-bytes ingest: the host ships resized I420 (4:2:0) planes —
    1.5 B/px, 2× fewer bytes than raw RGB and 8× fewer than float — and
    the TPU does color conversion + crop + bucket pad.  Production video
    decoders emit 4:2:0 natively, so in a real serving stack the host
    does NO pixel work at all; here the bench's JPEG path re-encodes via
    ``cv2.COLOR_BGR2YUV_I420`` (chroma-subsampling error only, and JPEG
    sources are 4:2:0 to begin with).

    Returns ``(encode, fn, whwh, bucket)``: ``encode(bgr) -> [He*3/2,
    We] uint8`` runs on host per frame; ``fn(packed_batch)`` on device.
    """
    import numpy as np

    from ..data.transforms import frame_bucket, resize_scale

    scale = resize_scale(height, width, min_size, max_size)
    rh, rw = int(round(height * scale)), int(round(width * scale))
    he, we = rh + (rh & 1), rw + (rw & 1)     # I420 needs even extents
    bucket = frame_bucket(height, width, min_size, max_size)
    whwh = np.asarray([rw, rh, rw, rh], np.float32)

    def encode(bgr):
        import cv2

        img = cv2.resize(bgr, (rw, rh), interpolation=cv2.INTER_LINEAR)
        if (he, we) != (rh, rw):              # edge-replicate to even
            img = cv2.copyMakeBorder(img, 0, he - rh, 0, we - rw,
                                     cv2.BORDER_REPLICATE)
        return cv2.cvtColor(img, cv2.COLOR_BGR2YUV_I420)

    def fn(packed_batch):
        return device_yuv420_to_rgb_pad(jnp.asarray(packed_batch),
                                        (he, we), (rh, rw), bucket)

    return encode, fn, whwh, bucket


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
