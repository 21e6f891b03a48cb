"""Datasets and loaders (TF-free rebuild of src/e2eflow data packages)."""

from unflow_tpu.data.base import Example, Loader, PairDataset, fit_to_shape, load_example
from unflow_tpu.data.chairs import FlyingChairs
from unflow_tpu.data.kitti import KITTI2012, KITTI2015, KITTIRaw
from unflow_tpu.data.middlebury import Middlebury
from unflow_tpu.data.sintel import Sintel, SintelFinal
from unflow_tpu.data.synthia import Synthia

DATASETS = {
    "kitti_raw": KITTIRaw,
    "kitti_2012": KITTI2012,
    "kitti_2015": KITTI2015,
    "sintel": Sintel,
    "sintel_final": SintelFinal,
    "synthia": Synthia,
    "chairs": FlyingChairs,
    "middlebury": Middlebury,
}


def dataset_normalization(name: str):
    """Per-dataset (mean, stddev) without touching the filesystem
    (normalization is a class attribute); None for synthetic/unknown."""
    return getattr(DATASETS.get(name), "normalization", None)


def get_dataset(name: str, data_dir: str, **kwargs) -> PairDataset:
    if name == "synthetic":
        raise ValueError(
            "synthetic batches come from unflow_tpu.data.synthetic.batch_iterator"
        )
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASETS)}")
    return DATASETS[name](data_dir, **kwargs)


__all__ = [
    "Example",
    "Loader",
    "PairDataset",
    "fit_to_shape",
    "load_example",
    "KITTIRaw",
    "KITTI2012",
    "KITTI2015",
    "Sintel",
    "SintelFinal",
    "Synthia",
    "FlyingChairs",
    "Middlebury",
    "DATASETS",
    "dataset_normalization",
    "get_dataset",
]
