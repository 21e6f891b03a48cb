"""Flow-format and image IO, TF-free (PIL + numpy).

Reference formats (SURVEY.md §2.2 P10/P11/P15):
  * ``.flo`` (Middlebury/Sintel/FlyingChairs): TAG float 202021.25
    ("PIEH"), int32 width/height, float32 (u, v) interleaved —
    reference reader in ``src/e2eflow/core/flow_util.py``.
  * KITTI 16-bit PNG flow: channels (u, v, valid) with
    ``flow = (uint16 - 2^15) / 64``; written back the same way for
    benchmark submission — ``src/e2eflow/kitti/input.py`` and
    ``flow_util.py``.
"""

from __future__ import annotations

import os
import struct
from pathlib import Path

import numpy as np
from PIL import Image

FLO_TAG = 202021.25


def _native():
    """The C++ decode sidecar, opt-in via UNFLOW_NATIVE=1.

    Measured on this host: PIL's C PNG decoder is faster for 8-bit
    images and the numpy codec ties for 16-bit, so the sidecar is not
    the default decode path. It exists for parity with the reference's
    native input layer and for embedding without Python imaging deps
    (C ABI, GIL-free batch decode).
    """
    if os.environ.get("UNFLOW_NATIVE", "0") != "1":
        return None
    from unflow_tpu.data import native

    return native if native.available() else None


def read_image(path: str | Path) -> np.ndarray:
    """Decode an image to float32 RGB in [0, 1], (H, W, 3).

    PNGs go through the native C++ decoder when available (bit-identical
    to the PIL path, parallel-friendly); other formats (ppm, jpg) use PIL.
    """
    p = str(path)
    if p.endswith(".png"):
        native = _native()
        if native is not None:
            return native.decode_rgb(p)
    with Image.open(p) as img:
        arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return arr


def read_image_u8(path: str | Path) -> np.ndarray:
    """Decode an image to uint8 RGB (H, W, 3) — no float conversion.

    Fast path for the training loader: the float32 [0,1] conversion
    (``u8/255``, exact in f32) moves on-device into the jitted train
    step, quartering host-side memory traffic and host->HBM transfer.
    """
    with Image.open(str(path)) as img:
        return np.asarray(img.convert("RGB"))


def write_image(path: str | Path, im: np.ndarray) -> None:
    arr = np.clip(im * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(str(path))


def read_flo(path: str | Path) -> np.ndarray:
    """Middlebury .flo -> (H, W, 2) float32."""
    with open(path, "rb") as f:
        tag = struct.unpack("<f", f.read(4))[0]
        if abs(tag - FLO_TAG) > 1e-3:
            raise ValueError(f"{path}: bad .flo tag {tag}")
        w, h = struct.unpack("<ii", f.read(8))
        data = np.frombuffer(f.read(w * h * 2 * 4), np.float32)
    return data.reshape(h, w, 2).copy()


def write_flo(path: str | Path, flow: np.ndarray) -> None:
    h, w, c = flow.shape
    if c != 2:
        raise ValueError(f"flow must have 2 channels, got {c}")
    with open(path, "wb") as f:
        f.write(struct.pack("<f", FLO_TAG))
        f.write(struct.pack("<ii", w, h))
        f.write(flow.astype("<f4").tobytes())


def read_kitti_png_flow(path: str | Path) -> tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit PNG -> ((H, W, 2) flow, (H, W, 1) valid mask).

    Pillow truncates 16-bit RGB PNGs to 8 bits, so this uses the native
    C++ decoder when available, else our own codec
    (:mod:`unflow_tpu.data.png16`).
    """
    native = _native()
    if native is not None:
        return native.decode_kitti_flow(str(path))
    from unflow_tpu.data.png16 import read_png16

    arr = read_png16(path)
    if arr.ndim != 3 or arr.shape[-1] < 3:
        raise ValueError(f"{path}: expected 3-channel 16-bit PNG, got {arr.shape}")
    flow = (arr[..., :2].astype(np.float32) - 2.0**15) / 64.0
    valid = (arr[..., 2:3] > 0).astype(np.float32)
    flow = flow * valid  # invalid px carry no flow
    return flow, valid


def write_kitti_png_flow(
    path: str | Path, flow: np.ndarray, valid: np.ndarray | None = None
) -> None:
    from unflow_tpu.data.png16 import write_png16

    h, w, _ = flow.shape
    if valid is None:
        valid = np.ones((h, w, 1), np.float32)
    out = np.zeros((h, w, 3), np.uint16)
    # Round to nearest (the devkit's uint16() rounds): a bare cast would
    # floor, biasing every stored value by up to -1/64 px and breaking
    # read/write round-trips.
    quant = np.clip(np.round(flow * 64.0 + 2.0**15), 0, 2**16 - 1)
    out[..., :2] = quant.astype(np.uint16)
    out[..., 2] = (valid[..., 0] > 0).astype(np.uint16)
    write_png16(path, out)


def pad_to_multiple(im: np.ndarray, multiple: int = 64) -> tuple[np.ndarray, tuple]:
    """Zero-pad H/W up to a multiple (FlowNet needs /64); returns
    (padded, (orig_h, orig_w)) for later cropping."""
    h, w = im.shape[:2]
    ph = -h % multiple
    pw = -w % multiple
    if ph == 0 and pw == 0:
        return im, (h, w)
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (im.ndim - 2)
    return np.pad(im, pad), (h, w)
