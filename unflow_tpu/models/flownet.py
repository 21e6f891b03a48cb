"""FlowNet-family architectures (S, C, stacked cascades).

Reference: simonmeister/UnFlow ``src/e2eflow/core/flownet.py``::
``flownet`` (stack dispatcher), ``flownet_s``, ``flownet_c``, and the
shared decoder helpers (``predict_flow``, deconv chain). Key structural
facts reproduced here (SURVEY.md §2.2 P1):

  * FlowNetS encoder: 7x7/2·64, 5x5/2·128, 5x5/2·256, 3x3·256,
    3x3/2·512, ·512, 3x3/2·512, ·512, 3x3/2·1024, ·1024; decoder of
    4x4/2 deconvs (512, 256, 128, 64) with skip concats and a 2-channel
    ``predict_flow`` conv at each of 5 scales; finest flow at 1/4
    resolution. Leaky-ReLU slope 0.1 everywhere except flow predictions.
  * FlowNetC: shared conv1-3 towers on both frames, correlation
    (max_displacement 20, stride 2 => 441 channels at 1/8 res) +
    leaky-ReLU, 1x1 ``conv_redir`` (32ch) on tower 1, concat -> conv3_1,
    then the same trunk/decoder as S (skip at 1/4 res comes from
    tower-1's conv2).
  * Stacking (spec strings like "CSS"): each subsequent net consumes
    (im1, im2, im2 warped by the previous full-res flow, previous flow,
    brightness error); lowercase letters mark frozen stages
    (stop_gradient on their outputs + params excluded from training —
    see :func:`param_labels`).
  * Networks predict flow in units scaled down by ``FLOW_SCALE``; the
    full-resolution flow is the finest prediction bilinearly upsampled
    4x and multiplied by ``4 * FLOW_SCALE``.

TPU notes: all convs are NHWC and lower straight onto the MXU via XLA;
``compute_dtype=bfloat16`` runs the towers in bf16 with f32 params
(flows and losses stay f32). The correlation op dispatches to the
Pallas kernel on TPU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from unflow_tpu.ops import backward_warp, correlation
from unflow_tpu.ops.conv2d import conv2d_s2_same
from unflow_tpu.ops.downsample import resize_bilinear

FLOW_SCALE = 5.0  # reference: src/e2eflow/core/flownet.py::FLOW_SCALE


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _pair_flip(x: jax.Array) -> jax.Array:
    """Swap each adjacent (fw, bw) pair along the leading axis.

    For an interleaved bidirectional batch of size 2B (see
    Trainer.make_train_step), row 2i <-> row 2i+1. Pure reshape +
    minor-axis reverse: shard-local under a batch sharding.
    """
    b2 = x.shape[0]
    return x.reshape((b2 // 2, 2) + x.shape[1:])[:, ::-1].reshape(x.shape)


class _StridedConv(nn.Module):
    """Stride-2 SAME conv whose data gradient avoids XLA's zero-dilated
    transposed-conv lowering (ops/conv2d.py phase decomposition; the
    encoder's 5x5/2 data gradients alone are ~22% of step FLOPs, 3/4 of
    them multiplying zeros). Same param tree as ``nn.Conv`` (kernel
    (K,K,C,F) + bias, lecun_normal/zeros), so checkpoints are
    interchangeable and the impl is a pure runtime choice.
    """

    features: int
    kernel_size: int
    compute_dtype: jnp.dtype = jnp.float32
    bwd_impl: str = "phase"  # phase | phase_folded (see ops/conv2d.py)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, c, f = self.kernel_size, x.shape[-1], self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, c, f), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        dt = self.compute_dtype
        y = conv2d_s2_same(x.astype(dt), kernel.astype(dt), self.bwd_impl)
        return y + bias.astype(dt)


class _PhaseDeconv(nn.Module):
    """4x4/stride-2 SAME transposed conv as one dense 2x2 conv + interleave.

    Mathematically identical to ``nn.ConvTranspose(features, (4, 4),
    strides=(2, 2), padding="SAME")`` with the SAME param tree (kernel
    ``(4, 4, C, F)`` + bias), so checkpoints are interchangeable and the
    impl is a pure runtime choice. Derivation (verified exact vs
    ``lax.conv_transpose``): with pad_lo=2 and no kernel flip,
    ``out[2y+dy, 2x+dx]`` uses exactly kernel taps ``(2a+dy, 2b+dx)``
    over input offsets ``a, b ∈ {-1, 0}`` (phase 0) / ``{0, 1}``
    (phase 1) — i.e. each output phase is a 2x2 window. All four phases
    fold into ONE stride-1 2x2 conv to 4F channels (a dense MXU matmul
    with zero wasted FLOPs) followed by shifted-slice interleaving,
    avoiding XLA's zero-dilated transposed-conv lowering.
    """

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.compute_dtype
        b, h, w, c = x.shape
        f = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, c, f), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        # (4,4,C,F) -> w2[a, b, c, (dy, dx, f)] = kernel[2a+dy, 2b+dx, c, f]
        w2 = (
            kernel.reshape(2, 2, 2, 2, c, f)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(2, 2, c, 4 * f)
        )
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w2.astype(dt), window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H+1, W+1, 4F)
        ph = y.reshape(b, h + 1, w + 1, 2, 2, f)
        p00 = ph[:, :h, :w, 0, 0]
        p01 = ph[:, :h, 1:, 0, 1]
        p10 = ph[:, 1:, :w, 1, 0]
        p11 = ph[:, 1:, 1:, 1, 1]
        r0 = jnp.stack([p00, p01], axis=3).reshape(b, h, 2 * w, f)
        r1 = jnp.stack([p10, p11], axis=3).reshape(b, h, 2 * w, f)
        out = jnp.stack([r0, r1], axis=2).reshape(b, 2 * h, 2 * w, f)
        return out + bias.astype(dt)


class _Decoder(nn.Module):
    """Shared FlowNet decoder: 4 deconv stages + 5 flow predictions.

    Takes the encoder's intermediate features; returns flows finest
    first: [flow2 (1/4 res), flow3, flow4, flow5, flow6 (1/64 res)].
    """

    compute_dtype: jnp.dtype = jnp.float32
    deconv_impl: str = "native"  # native (nn.ConvTranspose) | phase

    @nn.compact
    def __call__(self, skip2, skip3, conv4_1, conv5_1, conv6_1):
        dt = self.compute_dtype

        def conv_flow(x, name):
            return nn.Conv(2, (3, 3), padding="SAME", dtype=dt, name=name)(x)

        def tconv(x, features, name):
            if self.deconv_impl == "phase":
                return _PhaseDeconv(features, compute_dtype=dt, name=name)(x)
            return nn.ConvTranspose(
                features, (4, 4), strides=(2, 2), padding="SAME", dtype=dt,
                name=name,
            )(x)

        def deconv(x, features, name):
            return _leaky(tconv(x, features, name))

        def upflow(x, name):
            return tconv(x, 2, name)

        flow6 = conv_flow(conv6_1, "predict_flow6")
        deconv5 = deconv(conv6_1, 512, "deconv5")
        cat5 = jnp.concatenate([conv5_1, deconv5, upflow(flow6, "upflow6to5")], -1)

        flow5 = conv_flow(cat5, "predict_flow5")
        deconv4 = deconv(cat5, 256, "deconv4")
        cat4 = jnp.concatenate([conv4_1, deconv4, upflow(flow5, "upflow5to4")], -1)

        flow4 = conv_flow(cat4, "predict_flow4")
        deconv3 = deconv(cat4, 128, "deconv3")
        cat3 = jnp.concatenate([skip3, deconv3, upflow(flow4, "upflow4to3")], -1)

        flow3 = conv_flow(cat3, "predict_flow3")
        deconv2 = deconv(cat3, 64, "deconv2")
        cat2 = jnp.concatenate([skip2, deconv2, upflow(flow3, "upflow3to2")], -1)

        flow2 = conv_flow(cat2, "predict_flow2")
        f32 = jnp.float32
        return [flow2.astype(f32), flow3.astype(f32), flow4.astype(f32),
                flow5.astype(f32), flow6.astype(f32)]


class FlowNetS(nn.Module):
    """FlowNet-Simple: operates on channel-concatenated inputs.

    Reference: src/e2eflow/core/flownet.py::flownet_s.
    """

    compute_dtype: jnp.dtype = jnp.float32
    deconv_impl: str = "native"
    conv_impl: str = "native"  # native | phase | phase_folded (stride-2 bwd)

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        dt = self.compute_dtype
        x = x.astype(dt)

        def conv(x, features, kernel, stride, name):
            if stride == 2 and self.conv_impl != "native":
                mod = _StridedConv(
                    features, kernel, compute_dtype=dt,
                    bwd_impl=self.conv_impl, name=name,
                )
            else:
                mod = nn.Conv(
                    features, (kernel, kernel), strides=(stride, stride),
                    padding="SAME", dtype=dt, name=name,
                )
            return _leaky(mod(x))

        c1 = conv(x, 64, 7, 2, "conv1")
        c2 = conv(c1, 128, 5, 2, "conv2")
        c3 = conv(c2, 256, 5, 2, "conv3")
        c3_1 = conv(c3, 256, 3, 1, "conv3_1")
        c4 = conv(c3_1, 512, 3, 2, "conv4")
        c4_1 = conv(c4, 512, 3, 1, "conv4_1")
        c5 = conv(c4_1, 512, 3, 2, "conv5")
        c5_1 = conv(c5, 512, 3, 1, "conv5_1")
        c6 = conv(c5_1, 1024, 3, 2, "conv6")
        c6_1 = conv(c6, 1024, 3, 1, "conv6_1")
        return _Decoder(
            compute_dtype=dt, deconv_impl=self.deconv_impl, name="decoder"
        )(c2, c3_1, c4_1, c5_1, c6_1)


class FlowNetC(nn.Module):
    """FlowNet-Correlation: shared towers + cost volume.

    Reference: src/e2eflow/core/flownet.py::flownet_c.
    """

    compute_dtype: jnp.dtype = jnp.float32
    max_displacement: int = 20
    corr_stride: int = 2
    corr_impl: str | None = None  # None -> ops registry default ("auto")
    deconv_impl: str = "native"
    conv_impl: str = "native"  # native | phase | phase_folded (stride-2 bwd)

    @nn.compact
    def __call__(
        self,
        im1: jax.Array,
        im2: jax.Array,
        pair_flipped_im2: bool = False,
    ) -> list[jax.Array]:
        """``pair_flipped_im2``: promise that ``im2 == _pair_flip(im1)``
        (the bidirectional interleaved batch the trainer builds:
        im1 = interleave(n1, n2), im2 = interleave(n2, n1)). The shared
        feature tower then runs ONCE on im1 and tower(im2) is derived by
        flipping each example's (fw, bw) pair — bit-exact (convolution
        commutes with batch permutation) and it halves tower conv FLOPs
        in the hot bidirectional train step. The flip is a minor-axis
        reverse after a (B, 2) reshape, so the batch axis stays
        shard-local under a P("data") sharding.
        """
        dt = self.compute_dtype

        def strided(features, kernel, name):
            if self.conv_impl != "native":
                return _StridedConv(
                    features, kernel, compute_dtype=dt,
                    bwd_impl=self.conv_impl, name=name,
                )
            return nn.Conv(
                features, (kernel, kernel), strides=(2, 2), padding="SAME",
                dtype=dt, name=name,
            )

        def conv(x, features, kernel, stride, name):
            if stride == 2:
                return _leaky(strided(features, kernel, name)(x))
            return _leaky(
                nn.Conv(
                    features, (kernel, kernel), strides=(stride, stride),
                    padding="SAME", dtype=dt, name=name,
                )(x)
            )

        # Shared feature towers (same submodules applied to both frames).
        conv1 = strided(64, 7, "conv1")
        conv2 = strided(128, 5, "conv2")
        conv3 = strided(256, 5, "conv3")

        def tower(im):
            c1 = _leaky(conv1(im.astype(dt)))
            c2 = _leaky(conv2(c1))
            c3 = _leaky(conv3(c2))
            return c2, c3

        c2a, c3a = tower(im1)
        if pair_flipped_im2:
            c3b = _pair_flip(c3a)
        else:
            _, c3b = tower(im2)

        corr = correlation(
            c3a, c3b, max_displacement=self.max_displacement,
            stride=self.corr_stride, impl=self.corr_impl,
        )
        corr = _leaky(corr.astype(dt))
        redir = conv(c3a, 32, 1, 1, "conv_redir")
        x = jnp.concatenate([corr, redir], -1)

        c3_1 = conv(x, 256, 3, 1, "conv3_1")
        c4 = conv(c3_1, 512, 3, 2, "conv4")
        c4_1 = conv(c4, 512, 3, 1, "conv4_1")
        c5 = conv(c4_1, 512, 3, 2, "conv5")
        c5_1 = conv(c5, 512, 3, 1, "conv5_1")
        c6 = conv(c5_1, 1024, 3, 2, "conv6")
        c6_1 = conv(c6, 1024, 3, 1, "conv6_1")
        return _Decoder(
            compute_dtype=dt, deconv_impl=self.deconv_impl, name="decoder"
        )(c2a, c3_1, c4_1, c5_1, c6_1)


def full_res_flow(flows: Sequence[jax.Array], height: int, width: int) -> jax.Array:
    """Finest prediction -> full-resolution flow in pixels.

    flows[0] is at 1/4 resolution in FLOW_SCALE-compressed units;
    upsampling 4x scales the vectors by 4 (reference:
    src/e2eflow/core/unsupervised.py final flow assembly).
    """
    return resize_bilinear(flows[0] * (4.0 * FLOW_SCALE), height, width)


class FlowNetStack(nn.Module):
    """Stacked cascade per a spec string, e.g. "C", "CS", "css", "CSS".

    Reference: src/e2eflow/core/flownet.py::flownet (stack dispatcher).
    Uppercase letters are trainable stages, lowercase are frozen
    (outputs stop-gradiented here; exclude their params via
    :func:`param_labels`). Stage i>0 consumes
    concat(im1, im2, warp(im2, flow_prev), flow_prev, brightness_error).

    Returns a list (one entry per stage) of 5-scale flow lists, finest
    first, in raw network units (multiply by FLOW_SCALE and upsample for
    pixel-space flow).
    """

    spec: str = "C"
    compute_dtype: jnp.dtype = jnp.float32
    corr_impl: str | None = None
    max_displacement: int = 20
    corr_stride: int = 2
    deconv_impl: str = "native"
    conv_impl: str = "native"
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        im1: jax.Array,
        im2: jax.Array,
        pair_flipped_im2: bool = False,
    ) -> list[list[jax.Array]]:
        if not self.spec or self.spec[0].upper() not in ("C", "S"):
            raise ValueError(f"bad stack spec {self.spec!r}")
        # Per-stage rematerialization: the backward pass recomputes each
        # stage's activations from its inputs instead of keeping them
        # live across the whole cascade — HBM for FLOPs, the standard
        # trade for giant crops / deep stacks (param tree is unchanged,
        # so checkpoints are interchangeable). prevent_cse=False: the
        # model only ever runs under jit, where CSE protection is
        # unnecessary and pessimizes the schedule.
        CNet, SNet = FlowNetC, FlowNetS
        if self.remat:
            # static_argnums counts self at 0: pair_flipped_im2 is arg 3
            # (a Python bool branching the tower structure).
            CNet = nn.remat(FlowNetC, static_argnums=(3,), prevent_cse=False)
            SNet = nn.remat(FlowNetS, prevent_cse=False)
        b, h, w, _ = im1.shape
        stage_flows: list[list[jax.Array]] = []
        flow_prev = None
        for i, ch in enumerate(self.spec):
            kind = ch.upper()
            name = f"stage{i}_{kind}"
            if i == 0:
                if kind == "C":
                    flows = CNet(
                        compute_dtype=self.compute_dtype,
                        corr_impl=self.corr_impl,
                        max_displacement=self.max_displacement,
                        corr_stride=self.corr_stride,
                        deconv_impl=self.deconv_impl,
                        conv_impl=self.conv_impl, name=name,
                    )(im1, im2, pair_flipped_im2)
                else:
                    flows = SNet(
                        compute_dtype=self.compute_dtype,
                        deconv_impl=self.deconv_impl,
                        conv_impl=self.conv_impl, name=name,
                    )(jnp.concatenate([im1, im2], -1))
            else:
                if kind != "S":
                    raise ValueError(
                        f"only FlowNetS refinement stages are supported after the "
                        f"first net (spec {self.spec!r})"
                    )
                # Stage glue in compute dtype: the full-res gather is the
                # cascade's hottest op and its cost is bytes-per-index
                # quantized (measured on v5e: f32 12-ch packed gather
                # 140 ms vs bf16 102 ms at 16x320x1152) — and FlowNetS
                # casts its input to compute_dtype anyway, so warping in
                # f32 buys nothing downstream.
                dt = self.compute_dtype
                # flow_prev stays f32: sample COORDS need f32 (bf16 cannot
                # represent pixel positions past 256 exactly); only the
                # gathered image rides bf16.
                warped = backward_warp(im2.astype(dt), flow_prev)
                # Brightness error: epsilon-guarded norm, NOT
                # jnp.linalg.norm — norm's VJP is x/||x||, which is NaN
                # at ||x|| == 0, and bf16 makes exact zero differences
                # common. Only train_all/CSS runs this VJP (csS cuts it
                # with stop_gradient), which made CSS training NaN by
                # step 2 while csS was stable.
                diff = im1.astype(dt) - warped
                err = jnp.sqrt(
                    jnp.sum(jnp.square(diff), axis=-1, keepdims=True)
                    + jnp.asarray(1e-6, dt)
                )
                x = jnp.concatenate(
                    [
                        im1.astype(dt),
                        im2.astype(dt),
                        warped,
                        flow_prev.astype(dt),
                        err,
                    ],
                    -1,
                )
                flows = SNet(
                    compute_dtype=self.compute_dtype,
                    deconv_impl=self.deconv_impl,
                    conv_impl=self.conv_impl, name=name,
                )(x)
            if ch.islower():
                flows = [jax.lax.stop_gradient(f) for f in flows]
            stage_flows.append(flows)
            flow_prev = full_res_flow(flows, h, w)
        return stage_flows


def param_labels(spec: str, params) -> dict:
    """Label each stage's param subtree 'frozen'/'trainable' for optax.

    Lowercase spec letters (reference semantics: restored from a prior
    experiment and kept fixed) map to 'frozen'.
    """
    labels = {}
    for key in params:
        trainable = True
        for i, ch in enumerate(spec):
            if key.startswith(f"stage{i}_") and ch.islower():
                trainable = False
        labels[key] = "trainable" if trainable else "frozen"
    return labels
