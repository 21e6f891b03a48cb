"""Configuration system: dataclasses + INI files + experiment dirs.

Reference: simonmeister/UnFlow root ``config.ini`` parsed by
``src/e2eflow/util.py::config_dict`` (sections [dirs]/[run]/[train] with
per-dataset override sections like [train_kitti]), and ``src/run.py``'s
experiment-dir semantics: the config is snapshotted into
``<log>/ex/<name>/config.ini`` and the snapshot governs resumes — that
behavior is load-bearing for the stacked CSS recipes and is preserved
here (SURVEY.md §5 config row).
"""

from __future__ import annotations

import configparser
import dataclasses
from pathlib import Path


@dataclasses.dataclass
class TrainConfig:
    dataset: str = "synthetic"
    flownet: str = "C"
    batch_size: int = 4
    height: int = 320
    width: int = 1152
    num_iters: int = 500_000
    learning_rate: float = 1.0e-4
    decay_after: int = 100_000
    decay_interval: int = 100_000
    weight_decay: float = 0.0
    # Global-norm gradient clipping (0 = off, the reference behavior).
    # bf16 towers at aggressive LRs can diverge on high-variance streams
    # (measured: supervised lr 1e-3 batch 8 explodes within 2k steps);
    # clipping bounds the step without changing steady-state dynamics.
    grad_clip_norm: float = 0.0
    save_interval: int = 5_000
    display_interval: int = 100
    # Image summaries (flow color / warped frame / occlusion mask PNGs,
    # reference tf.summary images): 0 = every display_interval, -1 = off.
    image_summary_interval: int = 0
    # Mirror scalar + image summaries into a TensorBoard tfevents file
    # under <exp_dir>/tb/ (dependency-free writer, utils/tensorboard.py).
    tensorboard: bool = False
    eval_interval: int = 0  # 0 = no in-training eval
    # loss-term weights (reference config keys like ternary_weight)
    occ_weight: float = 12.4
    sym_weight: float = 0.0
    fb_weight: float = 0.2
    grad_weight: float = 0.0
    ternary_weight: float = 1.0
    photo_weight: float = 0.0
    smooth_1st_weight: float = 0.0
    smooth_2nd_weight: float = 3.0
    mask_occlusion: str = "fb"  # fb | disocc | (empty)
    border_ratio: float = 0.0
    # Affine geometric augmentation (reference core/augment.py; ranges are
    # [MED] recollections so everything defaults to off). Fractions of
    # min(H, W) for translations; degrees for rotations.
    aug_translate: float = 0.0
    aug_rotate: float = 0.0
    aug_zoom_min: float = 1.0
    aug_zoom_max: float = 1.0
    aug_rel_translate: float = 0.0
    aug_rel_rotate: float = 0.0
    aug_rel_zoom: float = 0.0
    # Temporal order-swap augmentation (reference core/input.py's optional
    # image swapping, SURVEY §2.2 P8): per example, with this probability
    # train on (im2, im1) instead of (im1, im2). Valid for unsupervised
    # training only — the bidirectional objective is direction-symmetric,
    # but supervised GT flow is not. Default off.
    aug_swap_prob: float = 0.0
    # Photometric augmentation (reference core/augment.py::
    # random_photometric) and the shared random horizontal flip
    # (core/input.py). On by default to match the reference's training
    # regime; exposed because controlled experiments (and supervised
    # fine-tuning on clean synthetic GT) need them independently
    # switchable.
    aug_photometric: bool = True
    aug_hflip: bool = True
    # Stddev of the per-frame i.i.d. gaussian noise inside the
    # photometric augmentation (reference core/augment.py noise_stddev
    # [MED]). Exposed separately from aug_photometric because noise is
    # the one component that corrupts frame-to-frame MATCHING (contrast/
    # brightness/colour/gamma are drawn once per example and shared
    # across the pair, so they cancel in the data terms).
    aug_noise_stddev: float = 0.04
    train_all: bool = False
    supervised: bool = False
    finetune: tuple[str, ...] = ()
    # Correlation geometry (reference hardcodes 20/2 in flownet_c; exposed
    # here so tiny dryruns/tests can shrink the cost volume).
    max_displacement: int = 20
    corr_stride: int = 2
    # Host input geometry: crop_pad (reference default) or resize
    # (Input._resize_crop_or_pad resize mode — for datasets smaller than
    # the train crop, e.g. SYNTHIA at 512x768 configs).
    input_mode: str = "crop_pad"
    num_threads: int = 4  # host decode threads (reference queue runners)
    # Packed-dataset directory (data/packed.py): serve batches from a
    # pre-decoded memmap blob instead of per-step PNG decode. Empty =
    # decode from the dataset's source files. Create with cli.pack.
    packed_dir: str = ""
    # Temporal augmentation for KITTI raw: pair frames up to this many
    # steps apart (reference skip_frames; kitti_raw only, 1 = adjacent).
    max_frame_gap: int = 1
    # TPU-native knobs (no reference counterpart)
    compute_dtype: str = "bfloat16"  # model tower dtype; losses stay f32
    corr_impl: str = "auto"
    # Decoder transposed-conv lowering: "native" (nn.ConvTranspose) or
    # "phase" (dense 2x2-conv phase decomposition, models/flownet.py::
    # _PhaseDeconv — mathematically identical, checkpoint-compatible).
    deconv_impl: str = "native"
    # Stride-2 conv DATA-GRADIENT lowering: "native" (XLA's zero-dilated
    # transposed conv, 4x forward FLOPs, ~75% zeros) or "phase" /
    # "phase_folded" (ops/conv2d.py subpixel-phase decomposition —
    # same contraction up to summation order, checkpoint-compatible).
    conv_impl: str = "native"
    # Per-stage rematerialization (jax.checkpoint): recompute stage
    # activations in the backward pass instead of holding them in HBM —
    # enables bigger crops/batches/cascades at ~+1 forward of FLOPs.
    remat: bool = False
    num_devices: int = 0  # 0 = all visible
    spatial_shards: int = 1
    seed: int = 0

    def loss_weights(self) -> dict[str, float]:
        return {
            "occ": self.occ_weight,
            "sym": self.sym_weight,
            "fb": self.fb_weight,
            "grad": self.grad_weight,
            "ternary": self.ternary_weight,
            "photo": self.photo_weight,
            "smooth_1st": self.smooth_1st_weight,
            "smooth_2nd": self.smooth_2nd_weight,
        }


@dataclasses.dataclass
class DirsConfig:
    data: str = "data"
    log: str = "log"


@dataclasses.dataclass
class Config:
    dirs: DirsConfig = dataclasses.field(default_factory=DirsConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def experiment_dir(self, name: str) -> Path:
        return Path(self.dirs.log) / "ex" / name


def _coerce(value: str, field_type):
    if field_type is bool:
        return value.strip().lower() in ("1", "true", "yes", "on")
    if field_type is int:
        return int(value)
    if field_type is float:
        return float(value)
    if field_type == tuple[str, ...]:
        return tuple(v.strip() for v in value.split(",") if v.strip())
    return value


def load_config(path: str | Path, dataset_overrides: bool = True) -> Config:
    """Parse an INI config; per-dataset [train_<dataset>] sections override
    [train] keys, mirroring the reference's section layering."""
    parser = configparser.ConfigParser()
    read = parser.read(str(path))
    if not read:
        raise FileNotFoundError(path)

    cfg = Config()
    if parser.has_section("dirs"):
        for key, val in parser.items("dirs"):
            if hasattr(cfg.dirs, key):
                setattr(cfg.dirs, key, val)

    fields = {f.name: f.type for f in dataclasses.fields(TrainConfig)}

    def apply(section):
        for key, val in parser.items(section):
            if key in fields:
                setattr(cfg.train, key, _coerce(val, _FIELD_TYPES[key]))
            else:
                raise KeyError(f"unknown config key [{section}] {key}")

    if parser.has_section("train"):
        apply("train")
    if dataset_overrides:
        override = f"train_{cfg.train.dataset}"
        if parser.has_section(override):
            apply(override)
    return cfg


_FIELD_TYPES = {
    f.name: (
        tuple[str, ...] if f.name == "finetune" else f.type
        if isinstance(f.type, type) else
        {"str": str, "int": int, "float": float, "bool": bool,
         "tuple[str, ...]": tuple[str, ...]}[f.type]
    )
    for f in dataclasses.fields(TrainConfig)
}


def save_config(cfg: Config, path: str | Path) -> None:
    parser = configparser.ConfigParser()
    parser["dirs"] = dataclasses.asdict(cfg.dirs)
    train = {}
    for key, val in dataclasses.asdict(cfg.train).items():
        train[key] = ",".join(val) if isinstance(val, tuple) else str(val)
    parser["train"] = train
    # Atomic write (tmp + rename): the snapshot governs every resume and
    # is read concurrently by other processes on multi-host runs — a
    # reader must never see a truncated file.
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "w") as f:
        parser.write(f)
    tmp.replace(path)


def prepare_experiment_dir(cfg: Config, name: str) -> Path:
    """Create (or reuse) the experiment dir, snapshotting the config.

    The snapshot is always serialized from the *resolved* ``cfg`` (after
    CLI ``--set`` overrides), never copied from the raw file, so the
    hyperparameters the first segment trained with are exactly what a
    resume reloads. On resume, the existing snapshot wins — reference
    semantics from src/run.py (the copied config.ini governs resumes).
    """
    ex_dir = cfg.experiment_dir(name)
    snapshot = ex_dir / "config.ini"
    ex_dir.mkdir(parents=True, exist_ok=True)
    if not snapshot.exists():
        save_config(cfg, snapshot)
    return ex_dir
