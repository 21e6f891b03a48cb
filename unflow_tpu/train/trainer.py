"""Training loop: jitted train step, GSPMD data parallelism, resume.

Reference: simonmeister/UnFlow ``src/e2eflow/core/train.py::Trainer`` —
builds the train graph from a batch fn + loss fn, Adam with piecewise-
halved LR, Saver checkpoints every ``save_interval``, summaries every
``display_interval``, restores prior experiments' checkpoints for
stacked training, multi-GPU via in-graph towers + averaged gradients.

TPU-native redesign (SURVEY.md §1 runtime note): the TF1 graph executor
and queue runners are replaced by one jitted, buffer-donated train step;
parallelism is GSPMD over a device mesh (batch axis sharded, params
replicated, gradient all-reduce inserted by XLA over ICI); augmentation
runs on-device inside the step; state is an explicit pytree checkpointed
with orbax.
"""

from __future__ import annotations

import functools
import time
from pathlib import Path
from typing import Any, Callable, Iterable, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import optax

from unflow_tpu.augment import (
    normalize,
    random_affine,
    random_crop_flip,
    random_order_swap,
    random_photometric,
)
from unflow_tpu.config import Config
from unflow_tpu.data.base import PairDataset
from unflow_tpu.losses import supervised_loss, unsupervised_loss
from unflow_tpu.models import FlowNetStack, param_labels
from unflow_tpu.ops.warp import gather_shard_granularity
from unflow_tpu.parallel import (
    batch_sharding,
    create_mesh,
    is_lead_process,
    put_global_batch,
    replicated,
)
from unflow_tpu.train.checkpoint import CheckpointManager, init_stages_from
from unflow_tpu.train.schedule import piecewise_halving
from unflow_tpu.train.summaries import ImageSummaryWriter
from unflow_tpu.utils import MetricsLogger

# Single source of truth lives on the dataset base class; re-exported
# here because trainer/CLI fallbacks reference it by this name.
DEFAULT_NORMALIZATION = PairDataset.normalization


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


def build_model(cfg: Config) -> FlowNetStack:
    t = cfg.train
    return FlowNetStack(
        spec=t.flownet,
        compute_dtype=jnp.bfloat16 if t.compute_dtype == "bfloat16" else jnp.float32,
        corr_impl=None if t.corr_impl == "auto" else t.corr_impl,
        max_displacement=t.max_displacement,
        corr_stride=t.corr_stride,
        deconv_impl=t.deconv_impl,
        conv_impl=t.conv_impl,
        remat=t.remat,
    )


def build_optimizer(cfg: Config, params: dict) -> optax.GradientTransformation:
    t = cfg.train
    schedule = piecewise_halving(t.learning_rate, t.decay_after, t.decay_interval)
    adam = optax.adam(schedule)
    if t.weight_decay > 0:
        adam = optax.chain(optax.add_decayed_weights(t.weight_decay), adam)
    if t.grad_clip_norm > 0:
        adam = optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), adam)
    labels = param_labels(t.flownet, params)
    if "frozen" in labels.values():
        return optax.multi_transform(
            {"trainable": adam, "frozen": optax.set_to_zero()}, labels
        )
    return adam


def make_train_step(
    model: FlowNetStack,
    tx: optax.GradientTransformation,
    cfg: Config,
    normalization=DEFAULT_NORMALIZATION,
    gather_granularity: int = 1,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, logs).

    batch: {'im1', 'im2'} in [0,1] floats (+ 'flow','mask' if supervised),
    any size >= (height, width); cropping/flip/photometric run on-device.

    gather_granularity: the mesh's data-axis shard count, BOUND into the
    step's closure — the body re-enters the gather-cliff scope during
    tracing, so the compiled program always reflects this value, never
    the ambient contextvar of whatever thread happens to trace it, and
    two trainers with different meshes can never alias one compiled
    program through a stale scope (each binds its own value here).
    """
    t = cfg.train
    weights = cfg.train.loss_weights()
    mean, stddev = normalization
    crop_hw = (t.height, t.width)
    affine_ranges = {
        "translate": t.aug_translate,
        "rotate_deg": t.aug_rotate,
        "zoom_min": t.aug_zoom_min,
        "zoom_max": t.aug_zoom_max,
        "rel_translate": t.aug_rel_translate,
        "rel_rotate_deg": t.aug_rel_rotate,
        "rel_zoom": t.aug_rel_zoom,
    }
    affine_on = bool(
        t.aug_translate or t.aug_rotate or t.aug_rel_translate
        or t.aug_rel_rotate or t.aug_rel_zoom
        or t.aug_zoom_min != 1.0 or t.aug_zoom_max != 1.0
    )
    if t.aug_swap_prob and t.supervised:
        # Swapping frames inverts the motion; sparse GT flow is only
        # valid for the original direction (reference applies image
        # swapping on the unsupervised raw streams only).
        raise ValueError("aug_swap_prob requires unsupervised training")

    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        # Bind the closure's granularity for everything traced below
        # (warp chunking heuristics); a with-block around the body runs
        # at trace time, which is exactly when the ops read the scope.
        with gather_shard_granularity(gather_granularity):
            return _train_step_body(state, batch, rng)

    def _train_step_body(state: TrainState, batch: dict, rng: jax.Array):
        step_rng = jax.random.fold_in(rng, state.step)
        k_geo, k_photo, k_affine, k_swap = jax.random.split(step_rng, 4)

        def as_float(im):
            # uint8 fast-path loader batches: the f32/255 conversion is
            # exact, so this is bit-identical to host-side conversion at
            # a quarter of the host work and host->HBM bytes.
            if im.dtype == jnp.uint8:
                return im.astype(jnp.float32) / 255.0
            return im

        ims = [as_float(batch["im1"]), as_float(batch["im2"])]
        if t.aug_swap_prob:
            ims = list(random_order_swap(k_swap, ims[0], ims[1],
                                         t.aug_swap_prob))
        gt = [batch["flow"]] if t.supervised else None
        masks = [batch["mask"]] if t.supervised and "mask" in batch else None
        if affine_on:
            # Shared global + relative affine, applied at the loaded size
            # so the subsequent random crop sees the transformed frames.
            # (May SYNTHESIZE masks: remapped GT is invalid where the
            # pull-back leaves the source frame.)
            ims, gt, masks = random_affine(
                k_affine, ims, flows=gt, masks=masks, **affine_ranges
            )
        # Mask rides the image list so the crop/flip decision is drawn
        # ONCE (two calls replaying the key would silently desync if the
        # function's internal RNG consumption ever changes).
        extra = [masks[0]] if masks is not None else []
        cropped, gt = random_crop_flip(k_geo, ims + extra, crop_hw, flows=gt,
                                       horizontal_flip=t.aug_hflip)
        mask = cropped[2] if extra else None
        im1, im2 = cropped[0], cropped[1]

        # Photometric augmentation feeds the network only; the loss sees
        # the un-jittered pair (reference: core/unsupervised.py).
        if t.aug_photometric:
            im1_photo, im2_photo = random_photometric(
                k_photo, [im1, im2], noise_stddev=t.aug_noise_stddev)
        else:
            im1_photo, im2_photo = im1, im2
        n1 = normalize(im1_photo, mean, stddev)
        n2 = normalize(im2_photo, mean, stddev)

        def loss_fn(params):
            variables = {"params": params}
            if t.supervised:
                stages_fw = model.apply(variables, n1, n2)
                total, logs = supervised_loss(stages_fw[-1], gt[0], mask)
                return total, logs
            # One apply at 2x batch computes forward AND backward flow:
            # halves the kernel-launch count and runs the correlation /
            # conv kernels at a fuller batch (reference runs the net twice
            # with shared variables — core/flownet.py backward_flow=True).
            # The fw/bw pair of each example is interleaved via a (B, 2)
            # stack + merge so the doubled batch axis stays SHARD-LOCAL
            # under a P("data") batch sharding: the sharded dim is the
            # major axis of the merged group, so GSPMD inserts no
            # resharding. (A plain concat along the sharded axis lowers
            # to all-to-alls + collective-permutes; tests/test_sharding.py
            # asserts the compiled step stays all-reduce-only.)
            nb = n1.shape[0]

            def interleave(a, b):
                return jnp.stack([a, b], axis=1).reshape((2 * nb,) + a.shape[1:])

            def deinterleave(f, i):
                return f.reshape((nb, 2) + f.shape[1:])[:, i]

            # pair_flipped_im2: the second argument is exactly the first
            # with each (fw, bw) pair swapped, so FlowNetC computes its
            # shared feature tower once and pair-flips it (bit-exact).
            stages_both = model.apply(
                variables, interleave(n1, n2), interleave(n2, n1),
                pair_flipped_im2=True,
            )
            stages_fw = [[deinterleave(f, 0) for f in stage] for stage in stages_both]
            stages_bw = [[deinterleave(f, 1) for f in stage] for stage in stages_both]
            stage_ids = (
                range(len(stages_fw)) if t.train_all else [len(stages_fw) - 1]
            )
            total = jnp.zeros((), jnp.float32)
            logs = {}
            for si in stage_ids:
                stage_total, stage_logs = unsupervised_loss(
                    im1, im2, stages_fw[si], stages_bw[si],
                    weights=weights,
                    mask_occlusion=t.mask_occlusion,
                    border_ratio=t.border_ratio,
                )
                total = total + stage_total
                if len(stage_ids) > 1:
                    logs.update({f"stage{si}/{k}": v for k, v in stage_logs.items()})
                else:
                    logs.update(stage_logs)
            return total, logs

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        logs["loss"] = loss
        logs["grad_norm"] = optax.global_norm(grads)
        # Log the effective LR so schedule crossings (piecewise halving,
        # reference core/train.py) are visible in metrics.jsonl.
        logs["lr"] = piecewise_halving(
            t.learning_rate, t.decay_after, t.decay_interval
        )(state.step)
        return TrainState(state.step + 1, params, opt_state), logs

    return train_step


class Trainer:
    """End-to-end trainer over an experiment directory.

    Args:
      cfg: full config (the experiment-dir snapshot, if resuming).
      exp_dir: experiment directory (checkpoints + metrics.jsonl).
      batch_iterator: infinite iterator of host batches
        {'im1','im2'[,'flow','mask']} float32 [0,1], shaped
        (global_batch, H>=height, W>=width, C).
      normalization: (per-channel mean in [0,255], scalar stddev).
    """

    def __init__(
        self,
        cfg: Config,
        exp_dir: str | Path,
        batch_iterator: Iterable[dict],
        normalization=DEFAULT_NORMALIZATION,
        mesh=None,
        finetune_dirs: Sequence[str | Path] = (),
        eval_fn: Callable | None = None,
    ):
        t = cfg.train
        self.cfg = cfg
        self.exp_dir = Path(exp_dir)
        self.batches = iter(batch_iterator)
        self.model = build_model(cfg)
        self.mesh = mesh if mesh is not None else create_mesh(
            t.num_devices or None, spatial=t.spatial_shards
        )
        # Gather-cliff chunking (ops/warp.py) must slice the batch on
        # device-shard boundaries; the data-axis size is declared as a
        # scoped context around the step calls (see run()), so it never
        # leaks into other programs traced in this process.
        self._gather_shards = dict(self.mesh.shape).get("data", 1)
        self.rng = jax.random.PRNGKey(t.seed)

        sample = jnp.zeros((1, t.height, t.width, 3), jnp.float32)
        # local_devices()[0], NOT devices()[0]: on a multi-host pod the
        # global list's first device belongs to process 0 and is not
        # addressable from the others — init would crash every non-lead
        # process at startup.
        with jax.default_device(jax.local_devices()[0]):
            variables = jax.jit(self.model.init)(jax.random.PRNGKey(t.seed), sample, sample)
        params = variables["params"]
        self.ckpt = CheckpointManager(self.exp_dir)
        latest = self.ckpt.latest_step()
        # Stacked-finetune init applies to FRESH starts only: on resume
        # the checkpoint restore below overwrites it anyway, so reading
        # the prior experiments' full checkpoints would be wasted
        # startup I/O on every restart.
        if latest is None and (t.finetune or finetune_dirs):
            dirs = list(finetune_dirs) or [
                Path(cfg.dirs.log) / "ex" / name for name in t.finetune
            ]
            params = init_stages_from(dict(params), dirs)

        self.tx = build_optimizer(cfg, params)
        opt_state = self.tx.init(params)
        state = TrainState(jnp.zeros((), jnp.int32), params, opt_state)

        # Replicate state over the mesh; shard batches on the data axis
        # (and W over the spatial axis when spatial sharding is on — XLA
        # inserts the conv halo exchanges).
        rep = replicated(self.mesh)
        self.state = jax.device_put(state, rep)
        self._batch_sharding = batch_sharding(
            self.mesh, spatial_axis=2 if t.spatial_shards > 1 else None
        )

        if latest is not None:
            restored = self.ckpt.restore(jax.tree_util.tree_map(lambda x: x, state))
            self.state = jax.device_put(restored, rep)

        step_fn = make_train_step(self.model, self.tx, cfg, normalization,
                                  gather_granularity=self._gather_shards)
        self._step = jax.jit(step_fn, donate_argnums=(0,))
        # Multi-host: only the lead process owns filesystem side effects
        # (metrics/summaries/checkpoints live on a shared FS on TPU pods).
        self._lead = is_lead_process()
        self.logger = MetricsLogger(self.exp_dir) if self._lead else None
        # Optional TensorBoard mirror (reference: tf.summary scalars +
        # images). JSONL stays authoritative; tb/ is a view.
        self._tb = None
        if t.tensorboard and self._lead:
            from unflow_tpu.utils.tensorboard import EventWriter

            self._tb = EventWriter(self.exp_dir / "tb")
        # Image summaries (reference: tf.summary images at display
        # cadence); interval 0 follows display_interval, -1 disables.
        self._summary_interval = (
            t.display_interval
            if t.image_summary_interval == 0
            else t.image_summary_interval
        )
        # Multi-host: image summaries are OFF — the global batch is not
        # fully addressable from one process, and the summary forward
        # launched from the lead alone would deadlock the pod in the
        # collective rendezvous. Scalars/metrics still flow.
        self._summaries = (
            ImageSummaryWriter(
                self.exp_dir, self.model, normalization, event_writer=self._tb
            )
            if self._summary_interval > 0 and self._lead
            and jax.process_count() == 1
            else None
        )
        # Periodic in-training evaluation on a held-out split (reference:
        # core/train.py eval summaries). eval_fn(params) -> {name: value}.
        self.eval_fn = eval_fn

    @property
    def step(self) -> int:
        return int(self.state.step)

    def _put_batch(self, batch: dict) -> dict:
        # Single-host: sharded device_put. Multi-host: this process's
        # local rows assemble into the global batch (parallel.distributed).
        return put_global_batch(batch, self._batch_sharding)

    def run(self, max_iters: int | None = None) -> dict:
        """Train until cfg.train.num_iters (or max_iters), checkpointing.

        Restart-safe: rerunning resumes from the latest checkpoint
        (reference semantics: rerun run.py --ex <name>).
        """
        t = self.cfg.train
        target = min(max_iters or t.num_iters, t.num_iters)
        logs = {}
        pairs_accum, t_last = 0, time.perf_counter()
        # Wall time spent in checkpoint saves / in-training eval / image
        # summaries since t_last. Subtracted from the throughput window so
        # pairs_per_sec measures the train step itself, not the pauses —
        # otherwise the number swings wildly interval-to-interval and is
        # useless for regression tracking.
        pause_s = 0.0
        # Host-side step mirror: fetching state.step every iteration would
        # cost a device round-trip per step (the tunneled chip pipelines
        # steps; a per-step scalar fetch serializes them). The device
        # counter stays authoritative for checkpoint/restore.
        step = self.step  # one sync at (re)entry
        # The train step binds its granularity in its own closure (see
        # make_train_step) — this ambient scope only covers the OTHER
        # programs traced inside the loop (image summaries, eval_fn).
        # ASSUMPTION: those are traced on THIS thread — contextvars do
        # not propagate to new threads, so any future worker-thread
        # tracing (async eval, summary offload) must capture the scope
        # with contextvars.copy_context() or it silently sees the
        # default granularity of 1 (perf-only resharding, never wrong
        # results — see ops/warp.py's chunking analysis).
        with gather_shard_granularity(self._gather_shards):
            return self._run_loop(step, target, logs, pairs_accum, t_last, pause_s)

    def _run_loop(self, step, target, logs, pairs_accum, t_last, pause_s):
        t = self.cfg.train
        while step < target:
            batch = self._put_batch(next(self.batches))
            self.state, logs = self._step(self.state, batch, self.rng)
            step += 1
            pairs_accum += batch["im1"].shape[0]
            if step % t.display_interval == 0:
                now = time.perf_counter()
                work_s = max(now - t_last - pause_s, 1e-9)
                throughput = pairs_accum / work_s
                steps_in_window = pairs_accum / max(batch["im1"].shape[0], 1)
                step_ms = 1e3 * work_s / max(steps_in_window, 1)
                pairs_accum, t_last, pause_s = 0, now, 0.0
                if self.logger is not None:
                    record = {**{k: v for k, v in logs.items()},
                              "pairs_per_sec": throughput,
                              "step_ms": step_ms}
                    self.logger.log(step, record)
                    if self._tb is not None:
                        self._tb.scalars(record, step)
                        self._tb.flush()
            if self._summaries is not None and step % self._summary_interval == 0:
                t0 = time.perf_counter()
                self._summaries.write(step, self.state.params, batch)
                pause_s += time.perf_counter() - t0
            if self.eval_fn is not None and t.eval_interval and step % t.eval_interval == 0:
                t0 = time.perf_counter()
                metrics = self.eval_fn(self.state.params)
                if self.logger is not None:
                    eval_record = {f"eval/{k}": v for k, v in metrics.items()}
                    self.logger.log(step, eval_record)
                    if self._tb is not None:
                        self._tb.scalars(eval_record, step)
                pause_s += time.perf_counter() - t0
            if step % t.save_interval == 0 or step >= target:
                # EVERY process calls save: orbax's CheckpointManager.save
                # is a collective (multihost sync barriers inside) — a
                # lead-only call would deadlock a pod at the first save.
                # Orbax itself writes from one process.
                t0 = time.perf_counter()
                self.ckpt.save(step, jax.device_get(self.state))
                pause_s += time.perf_counter() - t0
        self.ckpt.save(self.step, jax.device_get(self.state), wait=True)
        return {k: float(v) for k, v in logs.items()}
