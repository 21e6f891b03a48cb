"""Synthetic translating-texture dataset (tests, smoke runs, benches).

No reference counterpart (the reference has no test suite); this stands
in for KITTI-style pairs: frame 2 is frame 1 shifted by a random global
translation, so ground-truth flow is known exactly and unsupervised
training has real signal (census loss can latch onto texture).
"""

from __future__ import annotations

import numpy as np


def _texture(rng: np.random.RandomState, h: int, w: int) -> np.ndarray:
    """Smooth random RGB texture in [0,1] with multi-scale detail."""
    im = np.zeros((h, w, 3), np.float32)
    for scale in (4, 8, 16):
        small = rng.rand(max(2, h // scale), max(2, w // scale), 3).astype(np.float32)
        reps = (int(np.ceil(h / small.shape[0])), int(np.ceil(w / small.shape[1])))
        up = np.kron(small, np.ones((reps[0], reps[1], 1), np.float32))[:h, :w]
        im += up / 3.0
    return np.clip(im, 0.0, 1.0)


def make_pair(
    rng: np.random.RandomState, h: int, w: int, max_shift: float = 8.0
):
    """Returns (im1, im2, flow): im2 = im1 shifted by an integer (u, v)."""
    u = int(rng.randint(-max_shift, max_shift + 1))
    v = int(rng.randint(-max_shift, max_shift + 1))
    big = _texture(rng, h + 2 * int(max_shift) + 2, w + 2 * int(max_shift) + 2)
    m = int(max_shift) + 1
    im1 = big[m : m + h, m : m + w]
    # Forward flow (u, v): pixel p in frame1 moves to p + (u, v) in frame2,
    # i.e. im2[y, x] = im1[y - v, x - u].
    im2 = big[m - v : m - v + h, m - u : m - u + w]
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0], flow[..., 1] = u, v
    return im1, im2, flow


def batch_iterator(
    batch_size: int,
    height: int,
    width: int,
    seed: int = 0,
    supervised: bool = False,
    max_shift: float = 8.0,
    start_batch: int = 0,
):
    """Infinite iterator of host batches for the Trainer.

    Batch i derives from (seed, i) alone, so a resumed run skips to its
    checkpointed step in O(1) (``start_batch``) and sees exactly the
    stream an uninterrupted run would (SURVEY §5 failure-detection row:
    step-indexed loader state).
    """
    index = start_batch
    while True:
        rng = np.random.RandomState((seed * 1_000_003 + index) % (2**32))
        index += 1
        im1s, im2s, flows = [], [], []
        for _ in range(batch_size):
            im1, im2, flow = make_pair(rng, height, width, max_shift)
            im1s.append(im1)
            im2s.append(im2)
            flows.append(flow)
        batch = {
            "im1": np.stack(im1s),
            "im2": np.stack(im2s),
        }
        if supervised:
            batch["flow"] = np.stack(flows)
            batch["mask"] = np.ones((batch_size, height, width, 1), np.float32)
        yield batch
