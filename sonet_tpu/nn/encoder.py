"""The shared SO-Net encoder (reference Encoder, models/networks.py:71-199).

Pipeline (channel-last): top-k point->node assignment, k-stacked points,
cluster-mean node recentering, decentered PointResNet over kN points,
segment-max node pooling (the reference's index_max CUDA kernel,
networks.py:181-185), optional kNN aggregation over nodes, final
PointNet, global max.

Everything runs inside one jit: the reference's dataloader-side Faiss
kNN of SOM nodes (modelnet_shrec_loader.py:257-259) is computed on
device when ``node_knn_I`` is None.

Stop-gradient boundaries match the reference ``.detach()`` calls
(networks.py:140-171, layers.py:351-352).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from ..ops import (assign_topk, knn, one_hot_f32, segment_max,
                   segment_max_fast)
from .layers import KNNModule, PointLayer, PointNetMLP, PointResNet


def resolve_pooling(cfg: Config) -> str:
    """Resolve cfg.pooling at trace time: the sorted-pipeline Pallas
    kernel on TPU (single chip or mesh), scatter on other backends
    (interpret-mode Pallas on CPU is for tests only — pin
    pooling='sorted_window' to exercise it).  Under a >1-device mesh
    the kernel runs per shard inside shard_map with a cross-shard pmax
    (ops/segment_fast.py) — segment max is associative, so the mesh no
    longer forces the ~4x slower scatter form (VERDICT r2 #1).  Every
    entry point funnels through this one check: Trainer, tasks/infer.py,
    ServingEngine."""
    if cfg.pooling != "auto":
        return cfg.pooling
    return "sorted_window" if jax.default_backend() == "tpu" else "scatter"


def _pooling_mesh(cfg: Config):
    """The concrete mesh for shard_map pooling under ``cfg``, or None on
    a single device.  Reconstructs the canonical entry-point mesh
    (parallel.mesh_for_config)."""
    import math
    if math.prod(cfg.mesh_shape) <= 1:
        return None
    from ..parallel import mesh_for_config
    return mesh_for_config(cfg)


class EncoderOutput(NamedTuple):
    """Functional replacement for the attributes the reference encoder
    stashes on ``self`` for the segmenter (networks.py:127-197,
    segmenter.py:89-109).

    Point order: with the sorted pooling pipeline (``perm is not None``)
    every per-point array — min_idx, centers, x_stack, sn_stack,
    x_decentered, first_pn_out — is in node-sorted order;
    ``inv_perm`` maps back (original[j] = sorted[inv_perm[j]]).  The
    segmenter unpermutes once before its k-copy averaging."""

    feature: jax.Array              # (B, F) global shape feature
    min_idx: jax.Array              # (B, kN) node id per stacked point
    mask_row_max: jax.Array         # (B, M) bool node occupancy
    counts: jax.Array               # (B, M) points per node (mask_row_sum)
    som_node: jax.Array             # (B, M, D) cluster-mean nodes
    centers: jax.Array              # (B, kN, D) per-point assigned center
    x_stack: jax.Array              # (B, kN, D)
    sn_stack: jax.Array             # (B, kN, D)
    x_decentered: jax.Array         # (B, kN, D)
    first_pn_out: jax.Array         # (B, kN, 384)
    first_pn_out_masked_max: jax.Array  # (B, M, 384) node-pooled
    knn_center: Optional[jax.Array]     # (B, M, D) or None (som_k < 2)
    knn_feature: Optional[jax.Array]    # (B, M, 512) or None
    final_pn_out: jax.Array         # (B, M, F)
    perm: Optional[jax.Array] = None      # (B, kN) sorted pos -> original
    inv_perm: Optional[jax.Array] = None  # (B, kN) original -> sorted pos
    onehot: Optional[jax.Array] = None    # (B, kN, M) assignment one-hot


class Encoder(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, pc: jax.Array, sn: jax.Array | None,
                 node: jax.Array, node_knn_I: jax.Array | None = None, *,
                 train: bool = False,
                 epoch: jax.Array | None = None) -> EncoderOutput:
        """pc: (B, N, D) points; sn: (B, N, D) normals or None;
        node: (B, M, D) SOM nodes; node_knn_I: (B, M, >=som_k) or None
        (computed on device from recentered nodes when absent)."""
        cfg = self.cfg
        B, N, D = pc.shape
        M = node.shape[1]
        k = cfg.k
        bn_kw = dict(momentum=cfg.bn_momentum,
                     bn_momentum_decay_step=cfg.bn_momentum_decay_step,
                     bn_momentum_decay=cfg.bn_momentum_decay,
                     compute_dtype=(jnp.bfloat16
                                    if cfg.compute_dtype == "bfloat16"
                                    else None))

        # -- point -> node top-k assignment (networks.py:127) -------------
        assign = assign_topk(jax.lax.stop_gradient(pc), node, k)
        min_idx = assign.min_idx                       # (B, kN)

        # -- optional node-sorted point order (TPU production path) -------
        # Sorting the stacked points by assigned node once per forward
        # makes node pooling scatter-free (the windowed Pallas kernel
        # covers each chunk with 1-2 node windows).  All per-point MLPs
        # are permutation-equivariant and the cluster-mean one-hot
        # matmuls are order-invariant, so only pooling + the segmenter's
        # k-copy averaging care.  Inputs carry no gradient, so these
        # gathers have no scatter transpose.
        sort_points = resolve_pooling(cfg) == "sorted_window"

        # -- stack k copies of the cloud (networks.py:131-137) ------------
        x_stack = jnp.tile(pc, (1, k, 1))              # (B, kN, D)
        sn_stack = jnp.tile(sn, (1, k, 1)) if sn is not None else None

        if sort_points:
            # One multi-operand stable sort: the point/normal channels
            # RIDE the sort as payloads.  Measured on v5e at (8, 15000):
            # 0.62 ms total vs 1.80 ms for sort_key_val + two row
            # gathers — take_along_axis row gathers run ~6 ns/row on
            # this chip, the sort streams its payloads.
            iota = jnp.broadcast_to(
                jnp.arange(min_idx.shape[1], dtype=jnp.int32), min_idx.shape)
            chans = [x_stack[..., c] for c in range(D)]
            n_sn = 0
            if sn_stack is not None:
                chans += [sn_stack[..., c] for c in range(D)]
                n_sn = D
            id0 = min_idx[:, 0]  # node of ORIGINAL stacked point 0
            out = jax.lax.sort([min_idx, iota, *chans], dimension=1,
                               is_stable=True, num_keys=1)
            min_idx, perm = out[0], out[1]
            # the inverse permutation is only consumed by the segmenter's
            # un-permute; computing it lazily keeps the second sort out
            # of the classification/AE graphs (XLA DCEs it)
            _, inv_perm = jax.lax.sort_key_val(perm, iota, dimension=1)
            x_stack = jnp.stack(out[2:2 + D], axis=-1)
            if sn_stack is not None:
                sn_stack = jnp.stack(out[2 + D:2 + D + n_sn], axis=-1)
            # empty nodes must forward ORIGINAL stacked point 0
            # (networks.py:185).  The sort is stable and point 0 is the
            # first original point of its node, so its sorted position is
            # the node's first slot: searchsorted — no inverse perm needed
            point0_idx = jax.vmap(
                lambda a, v: jnp.searchsorted(a, v, side="left"))(
                min_idx, id0).astype(jnp.int32)
        else:
            perm = inv_perm = point0_idx = None

        # bf16 one-hot halves the (B, kN, M) mask traffic; entries are
        # exactly 0/1 so the matmuls stay exact with f32 accumulation
        oh_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                    else jnp.float32)
        onehot = jax.nn.one_hot(min_idx, M, dtype=oh_dtype)  # (B, kN, M)
        counts = jnp.sum(onehot, axis=1, dtype=jnp.float32)  # mask_row_sum
        # occupancy from the (sorted-order) counts — identical multiset;
        # avoids materializing a second unsorted one-hot
        mask_row_max = (counts > 0) if sort_points else assign.mask_row_max

        # -- recenter nodes to actual cluster means (networks.py:139-143) -
        xs = jax.lax.stop_gradient(x_stack)
        cluster_sum = jnp.einsum("bnm,bnc->bmc", onehot, xs,
                                 preferred_element_type=jnp.float32)
        som_node = cluster_sum / (counts[..., None] + 1e-5)  # (B, M, D)

        # -- per-point centers & decentering (networks.py:167-171) --------
        centers = jax.lax.stop_gradient(
            jnp.einsum("bnm,bmc->bnc", onehot, som_node,
                       preferred_element_type=jnp.float32))
        x_decentered = jax.lax.stop_gradient(x_stack - centers)

        # -- first PointNet over kN points (networks.py:174-178) ----------
        if cfg.surface_normal and sn_stack is not None:
            first_in = jnp.concatenate([x_decentered, sn_stack], axis=-1)
        else:
            first_in = x_decentered
        first_mod = PointResNet(
            (64, 128, 256, 384), activation=cfg.activation,
            normalization=cfg.normalization, **bn_kw, name="first_pointnet")
        if cfg.remat:
            # rematerialize the (B, kN, 64..384) stack — the memory hot
            # spot (SURVEY.md §5); trade FLOPs for HBM.  `train` stays
            # static by closure.
            first_pn_out = nn.remat(
                lambda mdl, x: mdl(x, train=train, epoch=epoch))(
                first_mod, first_in)
        else:
            first_pn_out = first_mod(first_in, train=train, epoch=epoch)

        # -- node pooling: the index_max kernel (networks.py:181-185) -----
        if sort_points:
            pooled = segment_max_fast(first_pn_out, min_idx, M,
                                      counts=counts, point0_idx=point0_idx,
                                      mesh=_pooling_mesh(cfg))
        else:
            pooled = segment_max(first_pn_out, min_idx, M)  # (B, M, 384)

        if cfg.som_k >= 2:
            # On-device replacement for the dataloader Faiss kNN
            # (modelnet_shrec_loader.py:257-261).  Reference semantics:
            # the kNN graph is built on the INPUT SOM nodes, before the
            # cluster-mean recentering above (the loader computes it
            # host-side from the stored nodes; recentering happens later
            # inside Encoder.forward).  The KNNModule then *gathers* the
            # recentered ``som_node`` coordinates through these indices.
            if node_knn_I is None:
                knn_I = knn(jax.lax.stop_gradient(node), cfg.som_k)
            else:
                knn_I = node_knn_I[:, :, : cfg.som_k]
            knn_center, knn_feature = KNNModule(
                (512, 512), activation=cfg.activation,
                normalization=cfg.normalization, **bn_kw, name="knnlayer")(
                som_node, pooled, knn_I, cfg.som_k_type,
                train=train, epoch=epoch)
            final_in = jnp.concatenate([knn_center, knn_feature], axis=-1)
            final_pn_out = PointNetMLP(
                (768, cfg.feature_num), activation=cfg.activation,
                normalization=cfg.normalization, **bn_kw,
                name="final_pointnet")(final_in, train=train, epoch=epoch)
        else:
            knn_center = knn_feature = None
            final_in = jnp.concatenate([som_node, pooled], axis=-1)
            final_pn_out = PointResNet(
                (512, 512, 768, cfg.feature_num), activation=cfg.activation,
                normalization=cfg.normalization, **bn_kw,
                name="final_pointnet")(final_in, train=train, epoch=epoch)

        final_pn_out = final_pn_out.astype(jnp.float32)
        # global max over nodes (networks.py:197) with FIRST-WINNER
        # gradient routing like torch.max: exact cross-node ties are
        # common here (overlapping kNN neighborhoods make whole node
        # rows identical — ~20% of channels at small M), and jnp.max
        # splits tie gradients evenly, which diverges from the
        # reference's trajectory.  The one-hot product form routes the
        # cotangent to the first winner with no scatter in the backward.
        am = jnp.argmax(final_pn_out, axis=1)           # (B, F), first max
        oh_max = jax.nn.one_hot(am, final_pn_out.shape[1], axis=1,
                                dtype=final_pn_out.dtype)  # (B, M, F)
        feature = jnp.sum(final_pn_out * oh_max, axis=1)   # (B, F)

        return EncoderOutput(
            feature=feature, min_idx=min_idx, mask_row_max=mask_row_max,
            counts=counts, som_node=som_node, centers=centers,
            x_stack=x_stack,
            sn_stack=sn_stack if sn_stack is not None else x_stack,
            x_decentered=x_decentered, first_pn_out=first_pn_out,
            first_pn_out_masked_max=pooled, knn_center=knn_center,
            knn_feature=knn_feature, final_pn_out=final_pn_out,
            perm=perm, inv_perm=inv_perm, onehot=onehot)


class Transformer(nn.Module):
    """Rotation regressor (reference Transformer, networks.py:20-68).

    Dead code in the reference (constructed at networks.py:78, usage
    commented out at :147-164) — provided for API completeness.  Returns
    sin(theta) in [-1, 1]; ``rotation_matrix_y`` builds the y-axis
    rotation the commented reference block applies (networks.py:150-157).
    """

    cfg: Config

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False,
                 epoch: jax.Array | None = None) -> jax.Array:
        cfg = self.cfg
        bn_kw = dict(momentum=cfg.bn_momentum,
                     bn_momentum_decay_step=cfg.bn_momentum_decay_step,
                     bn_momentum_decay=cfg.bn_momentum_decay)
        first = PointNetMLP((32, 64, 128), activation=cfg.activation,
                            normalization=cfg.normalization, **bn_kw)(
            x, train=train, epoch=epoch)
        feat1 = jnp.max(first, axis=1, keepdims=True)  # (B, 1, 128)
        second_in = jnp.concatenate(
            [first, jnp.broadcast_to(feat1, first.shape)], axis=-1)
        second = PointNetMLP((256, 256), activation=cfg.activation,
                             normalization=cfg.normalization, **bn_kw)(
            second_in, train=train, epoch=epoch)
        feat2 = jnp.max(second, axis=1)  # (B, 256)

        h = PointLayer(128, activation=cfg.activation,
                       normalization=cfg.normalization, **bn_kw)(
            feat2, train=train, epoch=epoch)
        if cfg.dropout > 0.1:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        h = PointLayer(64, activation=cfg.activation,
                       normalization=cfg.normalization, **bn_kw)(
            h, train=train, epoch=epoch)
        if cfg.dropout > 0.1:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        sin_theta = jnp.tanh(PointLayer(1, activation=None,
                                        normalization=None)(h))
        return sin_theta  # (B, 1)


def rotation_matrix_y(sin_theta: jax.Array) -> jax.Array:
    """(B, 1) sin(theta) -> (B, 3, 3) y-axis rotation (networks.py:150-157)."""
    s = sin_theta[:, 0]
    c = jnp.sqrt(1.0 + 1e-5 - s * s)
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    rows = jnp.stack([
        jnp.stack([c, z, s], -1),
        jnp.stack([z, o, z], -1),
        jnp.stack([-s, z, c], -1),
    ], axis=1)
    return rows
