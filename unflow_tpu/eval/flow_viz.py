"""Flow visualization: color wheel and error images (numpy, host-side).

Reference: simonmeister/UnFlow ``src/e2eflow/core/flow_util.py``::
``flow_to_color`` (HSV wheel: hue = direction, saturation/value =
magnitude) and ``flow_error_image`` (red-intensity error over valid
pixels, KITTI-style) (SURVEY.md §2.2 P15).
"""

from __future__ import annotations

import numpy as np


def flow_to_color(flow: np.ndarray, max_flow: float | None = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) float RGB in [0, 1] via an HSV wheel."""
    u, v = flow[..., 0], flow[..., 1]
    mag = np.sqrt(u * u + v * v)
    ang = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    if max_flow is None:
        max_flow = max(np.max(mag), 1e-9)
    hue = (ang + 1.0) / 2.0
    sat = np.clip(mag / max_flow, 0.0, 1.0)
    val = np.ones_like(sat)

    # HSV -> RGB
    h6 = hue * 6.0
    i = np.floor(h6).astype(np.int32) % 6
    f = h6 - np.floor(h6)
    p = val * (1 - sat)
    q = val * (1 - f * sat)
    t = val * (1 - (1 - f) * sat)
    rgb = np.zeros(flow.shape[:2] + (3,), np.float32)
    lut = [
        (val, t, p), (q, val, p), (p, val, t),
        (p, q, val), (t, p, val), (val, p, q),
    ]
    for k, (r, g, b) in enumerate(lut):
        m = i == k
        rgb[..., 0] = np.where(m, r, rgb[..., 0])
        rgb[..., 1] = np.where(m, g, rgb[..., 1])
        rgb[..., 2] = np.where(m, b, rgb[..., 2])
    return rgb


def flow_error_image(
    pred: np.ndarray,
    gt: np.ndarray,
    mask: np.ndarray | None = None,
    log_scale: bool = True,
) -> np.ndarray:
    """(H, W, 2)x2 -> (H, W, 3) red-shaded error map; invalid px black."""
    err = np.sqrt(((pred - gt) ** 2).sum(-1))
    if log_scale:
        shade = np.log1p(err) / np.log1p(48.0)
    else:
        shade = err / 48.0
    shade = np.clip(shade, 0.0, 1.0)
    img = np.zeros(err.shape + (3,), np.float32)
    img[..., 0] = shade
    img[..., 2] = 1.0 - shade
    if mask is not None:
        img *= mask.reshape(err.shape + (1,) if mask.ndim == 2 else mask.shape)
    return img
