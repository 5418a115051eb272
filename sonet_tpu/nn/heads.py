"""Task heads: classifier (networks.py:202-227) and part segmenter
(networks.py:230-344), channel-last."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops.gather import gather_by_segment, permute_points
from .encoder import EncoderOutput
from .layers import PointLayer


class ClassifierHead(nn.Module):
    """feature (B, F) -> logits (B, classes): FC 512 -> 256 -> classes with
    dropout between (networks.py:202-227)."""

    cfg: Config

    @nn.compact
    def __call__(self, feature: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        cfg = self.cfg
        bn_kw = dict(momentum=cfg.bn_momentum,
                     bn_momentum_decay_step=cfg.bn_momentum_decay_step,
                     bn_momentum_decay=cfg.bn_momentum_decay,
                     compute_dtype=(jnp.bfloat16
                                    if cfg.compute_dtype == "bfloat16"
                                    else None))
        h = PointLayer(512, activation=cfg.activation,
                       normalization=cfg.normalization, **bn_kw, name="fc1")(
            feature, train=train, epoch=epoch)
        if cfg.dropout > 0.1:  # networks.py:220-224
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        h = PointLayer(256, activation=cfg.activation,
                       normalization=cfg.normalization, **bn_kw, name="fc2")(
            h, train=train, epoch=epoch)
        if cfg.dropout > 0.1:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        return PointLayer(cfg.classes, activation=None, normalization=None,
                          name="fc3")(h)


NUM_SHAPE_CATEGORIES = 16  # ShapeNetPart object categories (networks.py:292)


class SegmenterHead(nn.Module):
    """Per-point part scores from concatenated skip features
    (networks.py:259-344 + the node->point gathers of segmenter.py:89-98).

    Channel plan (surface_normal, som_k>=2):
    D + D + D + D + 16 + 384 + 384 + 512 + F + F  (networks.py:239).
    Skip features are gathered from node maps back to the kN stacked
    points by the assignment index (== argmax of the one-hot mask,
    segmenter.py:90).  After three shared-MLP layers the k stacked copies
    are averaged back to N points (networks.py:330-336; generalized to
    any k instead of the reference's hardcoded k in {2, 3}).
    """

    cfg: Config

    @nn.compact
    def __call__(self, enc: EncoderOutput, label: jax.Array, *,
                 train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        cfg = self.cfg
        B, kN, _ = enc.x_stack.shape
        N = kN // cfg.k

        # node -> point skip gathers (segmenter.py:92-98) routed as
        # one-hot MXU matmuls (the encoder already built the one-hot)
        g384 = gather_by_segment(enc.first_pn_out_masked_max, enc.min_idx,
                                 enc.onehot)
        g_final = gather_by_segment(enc.final_pn_out, enc.min_idx,
                                    enc.onehot)

        label_onehot = jax.nn.one_hot(label, NUM_SHAPE_CATEGORIES,
                                      dtype=enc.x_stack.dtype)  # (B, 16)

        # parts stay UN-concatenated: layer1 is a ConcatDense over them
        # (identical param tree to Dense over the reference's concat,
        # networks.py:298-325), so the (B, kN, 3356) concat and its
        # backward split never materialize.  The rank-2 parts
        # (label one-hot, global feature) broadcast along points INSIDE
        # the GEMM — their (B, kN, C) expansion (and its kN-redundant
        # FLOPs) is skipped too.
        parts = [enc.x_decentered, enc.x_stack, enc.centers]
        if cfg.surface_normal:
            parts.append(enc.sn_stack)
        parts += [label_onehot, enc.first_pn_out, g384]
        if cfg.som_k >= 2:
            assert enc.knn_feature is not None
            parts.append(gather_by_segment(enc.knn_feature, enc.min_idx,
                                           enc.onehot))
        parts += [g_final, enc.feature]

        bn_kw = dict(momentum=cfg.bn_momentum,
                     bn_momentum_decay_step=cfg.bn_momentum_decay_step,
                     bn_momentum_decay=cfg.bn_momentum_decay,
                     compute_dtype=(jnp.bfloat16
                                    if cfg.compute_dtype == "bfloat16"
                                    else None))

        def eq(c, act=True, name=None):
            return PointLayer(
                c, activation=cfg.activation if act else None,
                normalization=cfg.normalization if act else None, **bn_kw,
                name=name)

        h = eq(1024, name="layer1")(tuple(parts), train=train, epoch=epoch)
        h = eq(512, name="layer2")(h, train=train, epoch=epoch)
        h = eq(256, name="layer3")(h, train=train, epoch=epoch)

        # sorted encoder pipeline: restore original stacked order once,
        # after the (permutation-equivariant) shared MLPs, so the k-copy
        # reshape below lines up (encoder.EncoderOutput docstring)
        if enc.inv_perm is not None:
            h = permute_points(h, enc.inv_perm, enc.perm)

        # average the k stacked copies back to N points (networks.py:330-336)
        h = jnp.mean(h.reshape(B, cfg.k, N, -1), axis=1)  # (B, N, 256)

        h = eq(128, name="layer4")(h, train=train, epoch=epoch)
        if cfg.dropout > 0.1:  # drop4 (networks.py:339-340)
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        score = eq(cfg.classes, act=False, name="layer5")(h)  # (B, N, classes)
        return score.astype(jnp.float32)  # f32 scores for the loss/softmax
