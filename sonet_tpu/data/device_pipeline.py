"""Device-resident input pipeline: the whole split lives in HBM.

The reference feeds the GPU from 8 host worker processes
(modelnet/train.py:25) doing per-item np.load + subsample + augmentation
+ Faiss kNN.  This host has ONE core; at ~4.4 ms/step the model consumes
~1,800 augmented 5,000-point clouds per second — far beyond what one
core can produce (measured ~600-900 items/s).  The TPU-native fix is to
make the *dataset* device-resident and the per-step work device-side:

* ``load_device_data`` stacks the raw (un-subsampled, un-augmented)
  split once — ModelNet40-scale is 9,840 x 10,000 x 6 f32 = 2.4 GB,
  comfortably inside 16 GB HBM — and ships it to the device a single
  time.
* ``sample_batch`` runs INSIDE the train-step jit: row gather, random
  5,000-of-10,000 subsample (top-k over random keys = distinct uniform
  subset), and the exact augmentation stack of the host loaders
  (modelnet_shrec_loader.py:219-245) as elementwise jax ops.

Per step the host transfers only B int32 indices and an rng key.  The
host loader path (`data/pipeline.BatchLoader`) stays the default and the
parity reference; enable this with ``--input_pipeline device``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config


class DeviceData(NamedTuple):
    pc: jax.Array                 # (T, N_raw, D)
    sn: Optional[jax.Array]       # (T, N_raw, D) or None
    node: jax.Array               # (T, M, D)
    label: jax.Array              # (T,)
    seg: Optional[jax.Array] = None  # (T, N_raw) per-point labels

    @property
    def size(self) -> int:
        return self.pc.shape[0]


def load_device_data(dataset, device=None, mesh=None) -> DeviceData:
    """Stack a map-style dataset's RAW items and put them on device.

    With ``mesh``, the arrays are REPLICATED over it: at SO-Net scale a
    whole split is ~2.4 GB of a 16 GB HBM, so replication (rather than
    sharding the item axis) keeps every batch gather local — the epoch
    index table is what gets sharded over the data axis
    (Trainer._device_epoch_index), so each chip gathers and augments
    only its batch shard with no collectives.

    Requires ``dataset.raw_item(idx)`` (full-resolution, no subsample or
    augmentation).  Falling back to ``dataset[idx]`` would silently bake
    ONE frozen train-time augmentation into HBM and then augment again
    per step — a corrupted distribution — so datasets without raw_item
    are rejected.  All items must share shapes (true for the reference
    layouts: 10k-point npy / fixed-size npz)."""
    get = getattr(dataset, "raw_item", None)
    if get is None:
        raise TypeError(
            f"{type(dataset).__name__} has no raw_item(); the "
            "device-resident pipeline needs un-augmented full-resolution "
            "items (use the host input pipeline for this dataset)")
    first = get(0)
    T = len(dataset)
    keys = [k for k in ("pc", "sn", "node", "label", "seg") if k in first]
    host = {k: np.empty((T,) + np.shape(first[k]),
                        np.asarray(first[k]).dtype) for k in keys}
    for i in range(T):
        item = get(i) if i else first
        for k in keys:
            host[k][i] = item[k]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P())
        put = lambda x: jax.device_put(x, sharding)  # noqa: E731
    elif device is not None:
        put = lambda x: jax.device_put(x, device)  # noqa: E731
    else:
        put = jax.device_put
    return DeviceData(
        pc=put(host["pc"]),
        sn=put(host["sn"]) if "sn" in host else None,
        node=put(host["node"]),
        label=put(host["label"].astype(np.int64)),
        seg=put(host["seg"]) if "seg" in host else None)


def _rot_y(theta):
    """(B,) angles -> (B, 3, 3) y-axis rotations (augmentation.py:37-55)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, z, s], -1),
                      jnp.stack([z, o, z], -1),
                      jnp.stack([-s, z, c], -1)], -2)


def _rot_perturb(rng, B, angle_sigma=0.06, angle_clip=0.18):
    """(B, 3, 3) small 3-axis rotations Rz@Ry@Rx (augmentation.py:82-130)."""
    a = jnp.clip(angle_sigma * jax.random.normal(rng, (B, 3)),
                 -angle_clip, angle_clip)
    cx, sx = jnp.cos(a[:, 0]), jnp.sin(a[:, 0])
    cy, sy = jnp.cos(a[:, 1]), jnp.sin(a[:, 1])
    cz, sz = jnp.cos(a[:, 2]), jnp.sin(a[:, 2])
    z, o = jnp.zeros_like(cx), jnp.ones_like(cx)
    Rx = jnp.stack([jnp.stack([o, z, z], -1),
                    jnp.stack([z, cx, -sx], -1),
                    jnp.stack([z, sx, cx], -1)], -2)
    Ry = jnp.stack([jnp.stack([cy, z, sy], -1),
                    jnp.stack([z, o, z], -1),
                    jnp.stack([-sy, z, cy], -1)], -2)
    Rz = jnp.stack([jnp.stack([cz, -sz, z], -1),
                    jnp.stack([sz, cz, z], -1),
                    jnp.stack([z, z, o], -1)], -2)
    return Rz @ Ry @ Rx


def _jitter(rng, x, sigma, clip):
    return x + jnp.clip(sigma * jax.random.normal(rng, x.shape),
                        -clip, clip)


def sample_batch(data: DeviceData, idx: jax.Array, rng: jax.Array,
                 cfg: Config, *, train: bool) -> Dict[str, jax.Array]:
    """Gather + subsample + augment one batch, all on device.

    idx: (B,) int32 item indices.  Mirrors ModelNetDataset.__getitem__ /
    the reference loader's train path (modelnet_shrec_loader.py:193-245):
    random distinct subsample to ``input_pc_num``, then optional y
    rotation, optional 3-axis perturbation, jitter (pc/sn 0.01/0.05,
    SOM nodes 0.04/0.1), per-item scale U(0.8, 1.2), optional shift."""
    B = idx.shape[0]
    N_raw = data.pc.shape[1]
    N = cfg.input_pc_num

    pc = jnp.take(data.pc, idx, axis=0)          # (B, N_raw, D)
    sn = jnp.take(data.sn, idx, axis=0) if data.sn is not None else None
    node = jnp.take(data.node, idx, axis=0)      # (B, M, D)
    label = jnp.take(data.label, idx, axis=0)
    seg = jnp.take(data.seg, idx, axis=0) if data.seg is not None else None

    r_sub, r_roty, r_rotp, r_jpc, r_jsn, r_jnode, r_scale, r_shift = \
        jax.random.split(rng, 8)

    if N < N_raw:
        # distinct uniform subset: argsort of iid uniform keys, first N.
        # (lax.top_k at k=N/2 lowers to an O(N*k) selection on TPU; the
        # full bitonic sort is far cheaper at these shapes)
        keys = jax.random.uniform(r_sub, (B, N_raw))
        choice = jnp.argsort(keys, axis=1)[:, :N].astype(jnp.int32)
        pc = jnp.take_along_axis(pc, choice[..., None], axis=1)
        if sn is not None:
            sn = jnp.take_along_axis(sn, choice[..., None], axis=1)
        if seg is not None:
            seg = jnp.take_along_axis(seg, choice, axis=1)

    if train:
        if cfg.rot_horizontal:
            R = _rot_y(jax.random.uniform(r_roty, (B,)) * 2 * jnp.pi)
            pc = pc @ R
            node = node @ R
            if sn is not None:
                sn = sn @ R
        if cfg.rot_perturbation:
            R = _rot_perturb(r_rotp, B)
            pc = pc @ R
            node = node @ R
            if sn is not None:
                sn = sn @ R
        pc = _jitter(r_jpc, pc, 0.01, 0.05)
        if sn is not None:
            sn = _jitter(r_jsn, sn, 0.01, 0.05)
        node = _jitter(r_jnode, node, 0.04, 0.1)
        scale = jax.random.uniform(r_scale, (B, 1, 1), minval=0.8,
                                   maxval=1.2)
        pc = pc * scale
        node = node * scale
        if sn is not None:
            sn = sn * scale
        if cfg.translation_perturbation:
            shift = jax.random.uniform(r_shift, (B, 1, pc.shape[-1]),
                                       minval=-0.1, maxval=0.1)
            pc = pc + shift
            node = node + shift

    batch = {"pc": pc.astype(jnp.float32), "node": node.astype(jnp.float32),
             "label": label}
    if sn is not None:
        batch["sn"] = sn.astype(jnp.float32)
    if seg is not None:
        batch["seg"] = seg
    return batch


def make_device_steps(model, cfg: Config, steps_per_epoch: int):
    """Jitted steps taking (state, data, idx, rng) — the sampling
    pipeline is fused into the same XLA program as the model step.

    The DeviceData arrays are ARGUMENTS, not closure captures: captured
    device arrays become HLO constants and a 2.4 GB split then has to be
    serialized into the program (minutes of lowering + a duplicate
    buffer).  As arguments they bind by reference at call time."""
    from ..train.loops import make_steps

    train_step, eval_step = make_steps(model, cfg, steps_per_epoch)
    raw_train = train_step.__wrapped__
    raw_eval = eval_step.__wrapped__

    def dtrain(state, data: DeviceData, idx, rng):
        r_data, r_model = jax.random.split(jax.random.fold_in(rng,
                                                              state.step))
        batch = sample_batch(data, idx, r_data, cfg, train=True)
        return raw_train(state, batch, r_model)

    def deval(state, data: DeviceData, idx):
        # deterministic per-item subsample seed (reference test mode also
        # subsamples randomly; determinism here makes eval reproducible)
        r = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), idx[0])
        batch = sample_batch(data, idx, r, cfg, train=False)
        return raw_eval(state, batch)

    return (jax.jit(dtrain, donate_argnums=0), jax.jit(deval))


def make_device_epoch_fns(model, cfg: Config, steps_per_epoch: int):
    """Whole-epoch programs: ``lax.scan`` over the per-step program.

    On a remote (tunneled) chip every dispatch costs ~1-20 ms of
    round-trip latency; per-step dispatch caps sustained throughput far
    below device speed.  Scanning the epoch inside ONE jit makes an
    epoch a single dispatch: the host ships the (S, B) index table once
    and fetches (S,)-stacked metrics once.

    train_epoch_fn(state, data, epoch_idx (S, B), rng)
        -> (state, {metric: (S,)})
    eval_epoch_fn(state, data, epoch_idx (S, B))
        -> {metric: (S, ...)} with per-item ``*_i`` arrays (S, B)
    """
    from ..train.loops import make_steps

    train_step, eval_step = make_steps(model, cfg, steps_per_epoch)
    raw_train = train_step.__wrapped__
    raw_eval = eval_step.__wrapped__

    def train_epoch_fn(state, data: DeviceData, epoch_idx, rng):
        def body(state, idx):
            r_data, r_model = jax.random.split(
                jax.random.fold_in(rng, state.step))
            batch = sample_batch(data, idx, r_data, cfg, train=True)
            return raw_train(state, batch, r_model)

        return jax.lax.scan(body, state, epoch_idx)

    def eval_epoch_fn(state, data: DeviceData, epoch_idx):
        def body(i, idx):
            r = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), i)
            batch = sample_batch(data, idx, r, cfg, train=False)
            m = raw_eval(state, batch)
            # drop per-batch visual payloads: stacking them over S steps
            # wastes HBM; eval aggregation only needs scalars and *_i
            m = {k: v for k, v in m.items()
                 if k.endswith("_i") or (hasattr(v, "ndim") and v.ndim == 0)}
            return i + 1, m

        _, ms = jax.lax.scan(body, 0, epoch_idx)
        return ms

    return (jax.jit(train_epoch_fn, donate_argnums=0),
            jax.jit(eval_epoch_fn))
