"""Autoencoder point decoder (reference networks.py:347-462).

Two branches from the global feature:

* ``DecoderLinear`` — FC pyramid F -> 2P -> 3P -> 4P -> 3P reshaped to P
  points; final bias init U(-1, 1) to start spread over the unit cube
  (networks.py:359-360).
* ``DecoderConv`` — six UpConv stages growing a 1x1 feature map to 64x64
  (NHWC), with ConvToPC taps at 16x16 (pc4: 256 pts), 32x32 (pc5: 1024)
  and 64x64 (pc6: 4096) (networks.py:393-431).

``Decoder`` concatenates the fc branch with the conv level selected by
``output_conv_pc_num`` (networks.py:442-462).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .layers import PointLayer, UpConv, activation_fn, he_normal_in


def _uniform_pm1() -> nn.initializers.Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -1.0, 1.0)
    return init


def _bn_kw(cfg: Config) -> dict:
    """BN momentum/decay + compute dtype plumb-through: a user setting
    --bn_momentum* must reach the decoder's BN layers too (the reference
    passes opt into every sub-network, networks.py:347-431)."""
    return dict(momentum=cfg.bn_momentum,
                bn_momentum_decay_step=cfg.bn_momentum_decay_step,
                bn_momentum_decay=cfg.bn_momentum_decay,
                compute_dtype=(jnp.bfloat16
                               if cfg.compute_dtype == "bfloat16" else None))


class DecoderLinear(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, feature: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        cfg = self.cfg
        P = cfg.output_fc_pc_num
        h = feature
        for c in (2 * P, 3 * P, 4 * P):
            h = PointLayer(c, activation=cfg.activation,
                           normalization=cfg.normalization, **_bn_kw(cfg))(
                h, train=train, epoch=epoch)
        h = h.astype(jnp.float32)
        h = nn.Dense(3 * P, kernel_init=he_normal_in(),
                     bias_init=_uniform_pm1(), name="linear_out")(h)
        # reference views the 3P vector as (3, P) channel-first
        # (networks.py:369); transpose to channel-last points.
        return jnp.transpose(h.reshape(-1, 3, P), (0, 2, 1))  # (B, P, 3)


class ConvToPC(nn.Module):
    """1x1 conv (act+norm) then 1x1 conv to 3 channels with U(-1,1) bias
    (networks.py:372-390)."""

    cfg: Config

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        cfg = self.cfg
        C = x.shape[-1]
        h = PointLayer(C, activation=cfg.activation,
                       normalization=cfg.normalization, **_bn_kw(cfg))(
            x, train=train, epoch=epoch)
        return nn.Dense(3, kernel_init=he_normal_in(),
                        bias_init=_uniform_pm1())(
            h.astype(jnp.float32))  # (B, H, W, 3)


class DecoderConvOutput(NamedTuple):
    pc4: jax.Array  # (B, 256, 3)
    pc5: jax.Array  # (B, 1024, 3)
    pc6: jax.Array  # (B, 4096, 3)


class DecoderConv(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, feature: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> DecoderConvOutput:
        cfg = self.cfg
        F = cfg.feature_num
        kw = dict(activation=cfg.activation, normalization=cfg.normalization,
                  **_bn_kw(cfg))
        x = feature.reshape(-1, 1, 1, F)  # NHWC 1x1
        x = UpConv(F, **kw)(x, train=train, epoch=epoch)            # 2x2
        x = UpConv(F // 2, **kw)(x, train=train, epoch=epoch)       # 4x4
        x = UpConv(F // 4, **kw)(x, train=train, epoch=epoch)       # 8x8
        x = UpConv(F // 8, **kw)(x, train=train, epoch=epoch)       # 16x16
        pc4 = ConvToPC(cfg)(x, train=train, epoch=epoch)
        x = UpConv(F // 8, **kw)(x, train=train, epoch=epoch)       # 32x32
        pc5 = ConvToPC(cfg)(x, train=train, epoch=epoch)
        x = UpConv(F // 8, **kw)(x, train=train, epoch=epoch)       # 64x64
        pc6 = ConvToPC(cfg)(x, train=train, epoch=epoch)

        def flat(p):
            B, H, W, _ = p.shape
            return p.reshape(B, H * W, 3)

        return DecoderConvOutput(pc4=flat(pc4), pc5=flat(pc5), pc6=flat(pc6))


class DecoderOutput(NamedTuple):
    pc: jax.Array                     # (B, output_pc_num, 3) final cloud
    linear_pc: Optional[jax.Array]    # (B, output_fc_pc_num, 3)
    conv_pc4: Optional[jax.Array]     # (B, 256, 3)
    conv_pc5: Optional[jax.Array]     # (B, 1024, 3)
    conv_pc6: Optional[jax.Array]     # (B, 4096, 3)


class Decoder(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, feature: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> DecoderOutput:
        cfg = self.cfg
        # the reference sizes buffers by opt.output_pc_num
        # (autoencoder.py); here the output is derived from the two
        # branch sizes — reject inconsistent configs instead of
        # silently ignoring the flag
        conv_out_num = cfg.output_conv_pc_num \
            if cfg.output_conv_pc_num in (1024, 4096) else 0
        derived = cfg.output_fc_pc_num + conv_out_num
        if cfg.output_pc_num > 0 and cfg.output_pc_num != derived:
            raise ValueError(
                f"output_pc_num={cfg.output_pc_num} inconsistent with "
                f"output_fc_pc_num={cfg.output_fc_pc_num} + selected "
                f"conv output {conv_out_num} (= {derived})")
        linear_pc = None
        if cfg.output_fc_pc_num > 0:
            linear_pc = DecoderLinear(cfg, name="fc_decoder")(
                feature, train=train, epoch=epoch)
        conv = None
        if cfg.output_conv_pc_num > 0:
            conv = DecoderConv(cfg, name="conv_decoder")(
                feature, train=train, epoch=epoch)

        # output selection (networks.py:451-462)
        if cfg.output_conv_pc_num == 4096:
            conv_out = conv.pc6
        elif cfg.output_conv_pc_num == 1024:
            conv_out = conv.pc5
        else:
            conv_out = None
        if linear_pc is None:
            pc = conv_out
        elif conv_out is None:
            pc = linear_pc
        else:
            pc = jnp.concatenate([linear_pc, conv_out], axis=1)
        return DecoderOutput(pc=pc, linear_pc=linear_pc,
                             conv_pc4=conv.pc4 if conv else None,
                             conv_pc5=conv.pc5 if conv else None,
                             conv_pc6=conv.pc6 if conv else None)
