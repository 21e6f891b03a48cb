"""KITTI datasets: raw drives (unsupervised) and 2012/2015 (eval/GT).

Reference: simonmeister/UnFlow ``src/e2eflow/kitti/data.py::KITTIData``
and ``src/e2eflow/kitti/input.py::KITTIInput`` (``input_raw``,
``input_train_2012``, ``input_train_2015``) — SURVEY.md §2.2 P10.
16-bit PNG GT decode ``(u16 - 2^15)/64`` with validity channel.

Expected layout under ``<data_dir>``:
  kitti_raw/<drive>/image_02/data/*.png         (any nesting of drives)
  kitti_2012/training/colored_0/??????_1{0,1}.png + flow_occ/??????_10.png
  kitti_2015/training/image_2/??????_1{0,1}.png + flow_occ/??????_10.png
"""

from __future__ import annotations

from pathlib import Path

from unflow_tpu.data.base import Example, PairDataset

# Reference KITTI normalization constants ([MED] recollection).
KITTI_MEAN = (96.81, 98.83, 94.48)
KITTI_STDDEV = 60.0


class KITTIRaw(PairDataset):
    """Consecutive-frame pairs from KITTI raw drives (no GT).

    The reference excludes frames overlapping the 2012/2015 eval scenes
    from raw training; pass ``exclude_file`` (one image path substring
    per line) to reproduce that filtering.
    """

    name = "kitti_raw"
    normalization = (KITTI_MEAN, KITTI_STDDEV)

    def __init__(self, data_dir, exclude_file: str | None = None):
        super().__init__(data_dir)
        self.exclude = []
        if exclude_file:
            self.exclude = [
                line.strip()
                for line in open(exclude_file)
                if line.strip()
            ]

    def train_examples(self) -> list[Example]:
        root = self._require(
            self.data_dir / "kitti_raw", "KITTI raw city/residential/road drives."
        )
        examples = []
        for image_dir in sorted(root.glob("**/image_02/data")):
            frames = sorted(image_dir.glob("*.png"))
            for a, b in zip(frames, frames[1:]):
                s = str(a)
                if any(x in s for x in self.exclude):
                    continue
                examples.append(Example(im1=str(a), im2=str(b)))
        if not examples:
            raise FileNotFoundError(f"no frame pairs under {root}")
        return examples

    def eval_examples(self, variant=None):
        raise ValueError("KITTI raw has no ground truth; use kitti_2012/2015")


class KITTI2012(PairDataset):
    name = "kitti_2012"
    normalization = (KITTI_MEAN, KITTI_STDDEV)
    image_dir = "colored_0"

    def _root(self) -> Path:
        return self._require(
            self.data_dir / self.name / "training",
            f"{self.name} training set with flow_occ GT.",
        )

    def _examples(self, flow_subdir: str) -> list[Example]:
        root = self._root()
        examples = []
        for gt in sorted((root / flow_subdir).glob("*_10.png")):
            frame_id = gt.name[: -len("_10.png")]
            im1 = root / self.image_dir / f"{frame_id}_10.png"
            im2 = root / self.image_dir / f"{frame_id}_11.png"
            if im1.exists() and im2.exists():
                examples.append(
                    Example(
                        im1=str(im1), im2=str(im2), flow=str(gt),
                        flow_format="kitti_png", meta={"id": frame_id},
                    )
                )
        if not examples:
            raise FileNotFoundError(f"no examples under {root}/{flow_subdir}")
        return examples

    def train_examples(self) -> list[Example]:
        return self._examples("flow_occ")

    def eval_examples(self, variant: str | None = "occ") -> list[Example]:
        # occ = all pixels (occluded included), noc = non-occluded only.
        return self._examples(f"flow_{variant or 'occ'}")


class KITTI2015(KITTI2012):
    name = "kitti_2015"
    image_dir = "image_2"
