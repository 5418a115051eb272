"""Task models (L4 of SURVEY.md §1): encoder + head compositions.

The reference wraps these in mutable ``Model`` classes with
``set_input``/``optimize`` buffer state (models/classifier.py:15-154,
segmenter.py:14-192, autoencoder.py:13-160); here they are pure flax
modules — training state lives in ``sonet_tpu.train.TrainState``.

The parameter tree keeps the reference's sub-network split as top-level
keys (``encoder`` / ``classifier`` / ``segmenter`` / ``decoder``) so
per-subnetwork checkpointing, encoder-only transfer (--pretrain) and
per-subnetwork learning rates map 1:1.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
from flax import linen as nn

from .config import Config
from .nn.decoder import Decoder, DecoderOutput
from .nn.encoder import Encoder, EncoderOutput
from .nn.heads import ClassifierHead, SegmenterHead


class ClassifierModel(nn.Module):
    """Encoder + classification head (models/classifier.py)."""

    cfg: Config

    @nn.compact
    def __call__(self, pc, sn, node, node_knn_I=None, *, train: bool = False,
                 epoch=None):
        enc = Encoder(self.cfg, name="encoder")(
            pc, sn, node, node_knn_I, train=train, epoch=epoch)
        score = ClassifierHead(self.cfg, name="classifier")(
            enc.feature, train=train, epoch=epoch)
        return score, enc


class SegmenterModel(nn.Module):
    """Encoder + per-point segmenter (models/segmenter.py)."""

    cfg: Config

    @nn.compact
    def __call__(self, pc, sn, node, label, node_knn_I=None, *,
                 train: bool = False, epoch=None):
        enc = Encoder(self.cfg, name="encoder")(
            pc, sn, node, node_knn_I, train=train, epoch=epoch)
        score = SegmenterHead(self.cfg, name="segmenter")(
            enc, label, train=train, epoch=epoch)
        return score, enc


class AutoencoderModel(nn.Module):
    """Encoder + two-branch point decoder (models/autoencoder.py)."""

    cfg: Config

    @nn.compact
    def __call__(self, pc, sn, node, node_knn_I=None, *, train: bool = False,
                 epoch=None):
        enc = Encoder(self.cfg, name="encoder")(
            pc, sn, node, node_knn_I, train=train, epoch=epoch)
        dec: DecoderOutput = Decoder(self.cfg, name="decoder")(
            enc.feature, train=train, epoch=epoch)
        return dec, enc


def build_model(cfg: Config) -> nn.Module:
    return {
        "classify": ClassifierModel,
        "retrieve": ClassifierModel,  # retrieval = classifier scores as keys
        "segment": SegmenterModel,
        "autoencode": AutoencoderModel,
    }[cfg.task](cfg)
