"""Reusable network blocks (flax.linen), channel-last.

Rebuild of models/layers.py.  The reference expresses shared MLPs as 1x1
Conv1d/Conv2d over ``BxCxN`` tensors; on TPU the idiomatic and fastest
form is a plain Dense over the trailing channel axis of ``(B, N, C)`` —
one MXU matmul, no layout shuffling.  ``PointLayer`` therefore unifies
the reference's ``EquivariantLayer`` (layers.py:243-296), ``MyLinear``
(:123-166) and 1x1 ``MyConv2d`` (:169-211).

BatchNorm reproduces the reference ``MyBatchNorm1d/2d`` (:22-120):
torch-convention momentum (ra = (1-m)*ra + m*batch), unbiased running
variance, and the per-epoch momentum-decay schedule
``m = max(m0 * decay^(epoch // step), 0.01)`` — here with ``epoch`` as a
traced scalar so no per-epoch recompilation happens.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gather import knn_gather


def activation_fn(name: Optional[str]) -> Callable[[jax.Array], jax.Array]:
    """relu / elu / swish / leakyrelu(0.1) (layers.py:134-141)."""
    if name is None:
        return lambda x: x
    return {
        "relu": nn.relu,
        "elu": nn.elu,
        "swish": lambda x: x * jax.nn.sigmoid(x),  # layers.py:14-19
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.1),
    }[name]


def he_normal_in() -> nn.initializers.Initializer:
    """normal(0, sqrt(2/fan_in)) — the reference init (layers.py:145-154)."""
    return nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def he_normal_out() -> nn.initializers.Initializer:
    """normal(0, sqrt(2/fan_out)) — UpConv's init quirk (layers.py:225-231
    uses out_channels in the denominator)."""
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BatchNorm(nn.Module):
    """Torch-semantics BatchNorm over the trailing channel axis, with the
    reference's epoch-based momentum decay (layers.py:60-70)."""

    momentum: float = 0.1
    momentum_decay_step: Optional[int] = None
    momentum_decay: float = 0.6
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, *, use_running_average: bool,
                 epoch: jax.Array | None = None) -> jax.Array:
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(C, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(C, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            # biased batch var.  Two forms:
            # * small reduction counts: STABLE two-pass E[(x-mean)^2]
            #   (torch F.batch_norm semantics).  The one-pass form
            #   cancels catastrophically when mean^2 >> var
            #   (near-constant channels) and rsqrt(var+eps) amplifies
            #   that into ~1% output error — found by the train-mode
            #   trajectory-parity suite (test_parity.py).
            # * large counts (the per-point BNs over B*kN ~ 120k points
            #   at flagship shapes): one-pass E[x^2]-E[x]^2, which
            #   computes both reductions in a single HBM read of the
            #   (B, kN, C) tensor — the two-pass form costs a second
            #   full read (+0.5 ms on the 3.7 ms flagship step,
            #   measured).  At these counts the residual risk is a
            #   ~1%-of-eps scale error on channels that are already
            #   near-constant (output ~ 0 there), negligible for
            #   training and eval alike.
            n = math.prod(x.shape[:-1])
            if n < 8192:
                var = jnp.mean(jnp.square(xf - mean), axes)  # biased
            else:
                var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                m = jnp.asarray(self.momentum, jnp.float32)
                if (self.momentum_decay_step is not None
                        and self.momentum_decay_step > 0 and epoch is not None):
                    e = jnp.asarray(epoch, jnp.float32)
                    decayed = self.momentum * (
                        self.momentum_decay ** jnp.floor(
                            e / self.momentum_decay_step))
                    m = jnp.where(e >= 1.0, jnp.maximum(decayed, 0.01), m)
                n = math.prod(x.shape[:-1])
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class InstanceNorm(nn.Module):
    """Instance normalization over the point axes, per sample per channel
    (the reference's ``--normalization instance`` option,
    layers.py:132-133/178-179/256-257: torch InstanceNorm1d/2d with
    affine=True, no running stats)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if x.ndim < 3:  # (B, C): nothing to normalize over — identity+affine
            return x * scale + bias
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class DenseBN(nn.Module):
    """Dense whose bias is stop-gradiented: used when a BatchNorm follows.

    BN's batch-mean subtraction cancels an additive per-channel bias
    EXACTLY, so the bias has zero true gradient in training; autodiff
    still materializes it as a full (B, N, C) cotangent reduce_sum —
    ~0.5 ms/step at flagship shapes on v5e.  The forward add is kept
    (eval-mode BN uses running stats, where the bias is live), only the
    dead gradient is cut.  The torch reference computes the same
    gradient as fp summation noise and Adam random-walks the bias on it;
    freezing is the exact behavior (documented in PARITY.md).

    Param tree is identical to ``nn.Dense`` (kernel + bias)."""

    features: int
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", he_normal_in(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.compute_dtype
        if dt is not None:
            x, kernel, bias = x.astype(dt), kernel.astype(dt), bias.astype(dt)
        return jnp.dot(x, kernel) + jax.lax.stop_gradient(bias)


class ConcatDense(nn.Module):
    """Dense over the concatenation of N inputs, computed as N sliced
    GEMMs + add.  Param tree is identical to ``nn.Dense`` applied to the
    concat (one ``kernel (sum C_i, F)`` + ``bias``) so checkpoints and
    weight transplants are unaffected — but the (B, N, sum C_i) concat is
    never materialized and its backward has no split (concat + split cost
    0.38 ms/step for PointResNet's skip; ~1 ms for the segmenter's
    3,356-channel skip concat at flagship shapes on v5e).

    Rank-2 inputs ``(B, C_i)`` among rank-3 ones are treated as
    broadcast-along-points (the segmenter's global feature and label
    one-hot, networks.py:298-325): their GEMM runs at ``(B, C_i)`` and
    the result broadcast-adds — skipping both the (B, kN, C_i)
    materialization and its (B*kN/B)x redundant FLOPs."""

    features: int
    compute_dtype: Optional[jnp.dtype] = None
    stop_bias_grad: bool = False  # see DenseBN

    @nn.compact
    def __call__(self, *xs: jax.Array) -> jax.Array:
        Cs = [x.shape[-1] for x in xs]
        kernel = self.param("kernel", he_normal_in(),
                            (sum(Cs), self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.compute_dtype
        if dt is not None:
            xs = tuple(x.astype(dt) for x in xs)
            kernel, bias = kernel.astype(dt), bias.astype(dt)
        if self.stop_bias_grad:
            bias = jax.lax.stop_gradient(bias)
        out_rank = max(x.ndim for x in xs)
        y = None
        off = 0
        for x, C in zip(xs, Cs):
            part = jnp.dot(x, kernel[off:off + C])
            if x.ndim < out_rank:  # broadcast-along-points input
                part = jnp.expand_dims(
                    part, tuple(range(1, 1 + out_rank - x.ndim)))
            y = part if y is None else y + part
            off += C
        return y + bias


class PointLayer(nn.Module):
    """Dense -> [BatchNorm] -> [activation] over the trailing axis.

    The single TPU-side replacement for EquivariantLayer / MyLinear /
    1x1 MyConv2d (all are matmuls over C once the layout is channel-last).

    ``compute_dtype`` (e.g. jnp.bfloat16) runs the matmul/activation in
    reduced precision — params and BN statistics stay float32 (standard
    mixed precision; halves HBM traffic on the bandwidth-bound parts).

    ``x2`` (or ``x`` given as a tuple/list of arrays): the layer acts on
    the virtual concatenation of the inputs via ``ConcatDense`` (same
    params, no materialized concat; used by PointResNet's skip layer and
    the segmenter's skip-concat layer1).
    """

    features: int
    activation: Optional[str] = "relu"
    normalization: Optional[str] = None
    momentum: float = 0.1
    bn_momentum_decay_step: Optional[int] = None
    bn_momentum_decay: float = 0.6
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, x2: jax.Array | None = None, *,
                 train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        bn = self.normalization == "batch"
        if isinstance(x, (tuple, list)) or x2 is not None:
            parts = tuple(x) if isinstance(x, (tuple, list)) else (x, x2)
            x = ConcatDense(self.features, compute_dtype=self.compute_dtype,
                            stop_bias_grad=bn, name="Dense_0")(*parts)
        else:
            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
            if bn:
                x = DenseBN(self.features, compute_dtype=self.compute_dtype,
                            name="Dense_0")(x)
            else:
                x = nn.Dense(self.features, kernel_init=he_normal_in(),
                             bias_init=nn.initializers.zeros,
                             dtype=self.compute_dtype)(x)
        if self.normalization == "batch":
            x = BatchNorm(momentum=self.momentum,
                          momentum_decay_step=self.bn_momentum_decay_step,
                          momentum_decay=self.bn_momentum_decay)(
                x, use_running_average=not train, epoch=epoch)
        elif self.normalization == "instance":
            x = InstanceNorm()(x)
        elif self.normalization is not None:
            raise NotImplementedError(
                f"normalization={self.normalization!r}")
        return activation_fn(self.activation)(x)


class PointNetMLP(nn.Module):
    """Stack of PointLayers; last layer has no activation/normalization
    (reference PointNet, layers.py:370-387)."""

    out_channels: Sequence[int]
    activation: str = "relu"
    normalization: Optional[str] = "batch"
    momentum: float = 0.1
    bn_momentum_decay_step: Optional[int] = None
    bn_momentum_decay: float = 0.6
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        n = len(self.out_channels)
        for i, c in enumerate(self.out_channels):
            last = i == n - 1
            x = PointLayer(c,
                           activation=None if last else self.activation,
                           normalization=None if last else self.normalization,
                           momentum=self.momentum,
                           bn_momentum_decay_step=self.bn_momentum_decay_step,
                           bn_momentum_decay=self.bn_momentum_decay,
                           compute_dtype=self.compute_dtype)(
                x, train=train, epoch=epoch)
        return x


class PointResNet(nn.Module):
    """First-layer-skip residual MLP (reference PointResNet,
    layers.py:390-432): the final layer consumes concat(out0, out[k-2])
    and has no activation/normalization."""

    out_channels: Sequence[int]
    activation: str = "relu"
    normalization: Optional[str] = "batch"
    momentum: float = 0.1
    bn_momentum_decay_step: Optional[int] = None
    bn_momentum_decay: float = 0.6
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        def layer(c, act, norm):
            return PointLayer(c, activation=act, normalization=norm,
                              momentum=self.momentum,
                              bn_momentum_decay_step=self.bn_momentum_decay_step,
                              bn_momentum_decay=self.bn_momentum_decay,
                              compute_dtype=self.compute_dtype)

        n = len(self.out_channels)
        out0 = layer(self.out_channels[0], self.activation,
                     self.normalization)(x, train=train, epoch=epoch)
        h = out0
        for c in self.out_channels[1:-1]:
            h = layer(c, self.activation, self.normalization)(
                h, train=train, epoch=epoch)
        # virtual concat via ConcatDense: same params as Dense over
        # [out0, h], but the (B, N, C0+Ck) tensor is never materialized
        return layer(self.out_channels[-1], None, None)(
            out0, h, train=train, epoch=epoch)


class KNNModule(nn.Module):
    """kNN aggregation over SOM nodes (reference KNNModule,
    layers.py:299-367): gather K neighbors per node, decenter coordinates
    (stop-gradient), shared-MLP over (B, M, K, C'), max over K.

    All layers keep activation+normalization (unlike PointNet stacks)."""

    out_channels: Sequence[int]
    activation: str = "relu"
    normalization: Optional[str] = "batch"
    momentum: float = 0.1
    bn_momentum_decay_step: Optional[int] = None
    bn_momentum_decay: float = 0.6
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, coordinate: jax.Array, x: jax.Array,
                 knn_idx: jax.Array, center_type: str = "avg", *,
                 train: bool = False, epoch: jax.Array | None = None):
        """coordinate: (B, M, D); x: (B, M, C); knn_idx: (B, M, K).

        Returns (neighbors_center (B, M, D), feature (B, M, out[-1])).
        """
        coord = jax.lax.stop_gradient(coordinate)
        neighbors = knn_gather(coord, knn_idx)  # (B, M, K, D)
        if center_type == "avg":  # layers.py:347-348
            center = jnp.mean(neighbors, axis=2, keepdims=True)
        elif center_type == "center":  # layers.py:349-350
            center = coord[:, :, None, :]
        else:
            raise ValueError(f"center_type={center_type!r}")
        decentered = jax.lax.stop_gradient(neighbors - center)
        center = jax.lax.stop_gradient(jnp.squeeze(center, 2))

        x_neighbors = knn_gather(x, knn_idx)  # (B, M, K, C)
        h = jnp.concatenate([decentered, x_neighbors], axis=-1)
        for c in self.out_channels:
            h = PointLayer(c, activation=self.activation,
                           normalization=self.normalization,
                           momentum=self.momentum,
                           bn_momentum_decay_step=self.bn_momentum_decay_step,
                           bn_momentum_decay=self.bn_momentum_decay,
                           compute_dtype=self.compute_dtype)(
                h, train=train, epoch=epoch)
        feature = jnp.max(h, axis=2)  # max over K
        return center, feature


class UpConv(nn.Module):
    """2x nearest upsample + 3x3 conv (reference UpConv, layers.py:214-240),
    NHWC.  Weight init uses fan_out (the reference's weight_init override)
    and bias 0.001."""

    features: int
    activation: Optional[str] = "relu"
    normalization: Optional[str] = "batch"
    momentum: float = 0.1
    bn_momentum_decay_step: Optional[int] = None
    bn_momentum_decay: float = 0.6
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        B, H, W, C = x.shape
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        x = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=he_normal_out(),
                    bias_init=nn.initializers.constant(0.001),
                    dtype=self.compute_dtype)(x)
        if self.normalization == "batch":
            x = BatchNorm(momentum=self.momentum,
                          momentum_decay_step=self.bn_momentum_decay_step,
                          momentum_decay=self.bn_momentum_decay)(
                x, use_running_average=not train, epoch=epoch)
        return activation_fn(self.activation)(x)
