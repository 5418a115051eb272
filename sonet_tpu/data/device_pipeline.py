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


def stack_host_split(dataset) -> dict:
    """Stack a map-style dataset's RAW items into host numpy arrays.

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
    host["label"] = host["label"].astype(np.int64)
    return host


def split_nbytes(host: dict) -> int:
    return sum(a.nbytes for a in host.values())


def estimate_split_nbytes(dataset) -> int:
    """Stacked-split bytes WITHOUT stacking (one raw item × len):
    lets placement/budget decisions run before any full-split host
    materialization (labels counted at their stacked int64 width)."""
    get = getattr(dataset, "raw_item", None)
    if get is None:
        raise TypeError(
            f"{type(dataset).__name__} has no raw_item(); the "
            "device-resident pipeline needs un-augmented full-resolution "
            "items (use the host input pipeline for this dataset)")
    first = get(0)
    per = 0
    for k in ("pc", "sn", "node", "label", "seg"):
        if k in first:
            a = np.asarray(first[k])
            per += a.size * (8 if k == "label" else a.dtype.itemsize)
    return per * len(dataset)


def _make_put(device=None, mesh=None):
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P())
        return lambda x: jax.device_put(x, sharding)
    if device is not None:
        return lambda x: jax.device_put(x, device)
    return jax.device_put


def _to_device_data(host: dict, put) -> DeviceData:
    return DeviceData(
        pc=put(host["pc"]),
        sn=put(host["sn"]) if "sn" in host else None,
        node=put(host["node"]),
        label=put(host["label"]),
        seg=put(host["seg"]) if "seg" in host else None)


def device_data_from_host(host: dict, device=None, mesh=None) -> DeviceData:
    """Ship pre-stacked host arrays (``stack_host_split``) to device."""
    return _to_device_data(host, _make_put(device, mesh))


def load_device_data(dataset, device=None, mesh=None) -> DeviceData:
    """Stack a map-style dataset's RAW items and put them on device.

    With ``mesh``, the arrays are REPLICATED over it: at SO-Net scale a
    whole split is ~2.4 GB of a 16 GB HBM, so replication (rather than
    sharding the item axis) keeps every batch gather local — the epoch
    index table is what gets sharded over the data axis
    (Trainer._device_epoch_index), so each chip gathers and augments
    only its batch shard with no collectives.

    For splits larger than HBM use ``ChunkedDeviceData`` (the Trainer
    picks automatically from ``--device_budget_gb``)."""
    return _to_device_data(stack_host_split(dataset),
                           _make_put(device, mesh))


class ShardedDeviceSplit:
    """Train split SHARDED over the mesh 'data' axis: each chip holds
    1/dp of the items, so a pod keeps a dp-times bigger split resident
    at full speed (``--dataset_placement sharded``; SURVEY.md §2.3's
    per-host input-sharding plan — the reference is single-GPU and has
    no analogue).

    Layout: every array gets a leading (dp, per) pair sharded
    ``P('data')`` on axis 0; epoch index tables are (S, dp, b) LOCAL
    indices (b = B/dp) sharded ``P(None, 'data')``.  ``sample_batch``
    gathers with a shard-aligned vmapped take — probed collective-free
    in the compiled HLO — then merges (dp, b) -> B, after which the
    whole augment/model path is identical to the replicated layout.

    Shuffle semantics: items are assigned to shards ONCE by a seeded
    global permutation; each epoch shuffles WITHIN shards, so a batch is
    the union of dp independent uniform draws from dp random item
    subsets — stratified, not identical to the reference's global
    shuffle (modelnet/train.py DataLoader shuffle=True), but the same
    distribution family; exact batch composition is pinned by the
    equality test against a replicated oracle consuming the composed
    global table (tests/test_device_pipeline.py).  Per epoch each shard
    drops ``counts[s] % b`` items plus ``min(counts) // b``-trailing
    rows — the per-shard analogue of the reference's drop_last.

    Per-process loading: built from a DATASET (not a pre-stacked dict),
    each process stacks ONLY the shard rows that land on its own
    addressable devices (``jax.make_array_from_callback`` asks for
    exactly those) — under ``--distributed`` a pod host materializes
    1/num_hosts of the split in host RAM instead of all of it, the
    analogue of the reference's per-worker disk streaming at pod scale.
    ``local_items`` records the global ids this process stacked.
    """

    def __init__(self, dataset_or_host, mesh, seed: int = 0):
        from jax.sharding import NamedSharding, PartitionSpec as P

        keyset = ("pc", "sn", "node", "label", "seg")
        if isinstance(dataset_or_host, dict):
            host = dataset_or_host
            T = host["pc"].shape[0]
            keys = [k for k in keyset if k in host]
            shapes = {k: tuple(host[k].shape[1:]) for k in keys}
            dtypes = {k: (np.dtype(np.int64) if k == "label"
                          else host[k].dtype) for k in keys}

            def fetch_rows(ids):
                return {k: host[k][ids].astype(dtypes[k], copy=False)
                        for k in keys}
        else:
            dataset = dataset_or_host
            get = getattr(dataset, "raw_item", None)
            if get is None:
                raise TypeError(
                    f"{type(dataset).__name__} has no raw_item(); the "
                    "device-resident pipeline needs un-augmented "
                    "full-resolution items (use the host input pipeline "
                    "for this dataset)")
            first = get(0)
            T = len(dataset)
            keys = [k for k in keyset if k in first]
            shapes = {k: tuple(np.shape(first[k])) for k in keys}
            dtypes = {k: (np.dtype(np.int64) if k == "label"
                          else np.asarray(first[k]).dtype) for k in keys}

            def fetch_rows(ids):
                out = {k: np.empty((len(ids),) + shapes[k], dtypes[k])
                       for k in keys}
                for j, gid in enumerate(ids):
                    item = get(int(gid))
                    for k in keys:
                        out[k][j] = item[k]
                return out

        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.dp = int(mesh.shape[self.axis])
        if T < self.dp:
            # an empty shard would otherwise surface as an opaque
            # ragged-np.stack ValueError from the pad below (ADVICE r3)
            raise ValueError(
                f"dataset has {T} items but the '{self.axis}' mesh axis "
                f"has {self.dp} shards; sharded placement needs at least "
                "one item per shard — use --dataset_placement replicated")
        self.size = T
        self.seed = seed
        base, rem = divmod(T, self.dp)
        self.counts = np.array([base + (s < rem) for s in range(self.dp)],
                               np.int64)
        per = int(self.counts.max()) if T else 0
        self.per = per
        self.perm = np.random.default_rng(seed + 777).permutation(T)
        offs = np.concatenate([[0], np.cumsum(self.counts)])
        rows = []  # (dp, per) global item ids; short shards pad w/ last
        for s in range(self.dp):
            ids = self.perm[offs[s]:offs[s + 1]]
            if len(ids) < per:
                ids = np.concatenate([ids,
                                      np.repeat(ids[-1:], per - len(ids))])
            rows.append(ids)
        shard_ids = np.stack(rows)  # (dp, per)

        # make_array_from_callback asks only for ADDRESSABLE shards
        # (slice(s, s+1) on axis 0 under P('data')): the per-shard row
        # cache means each local shard's items are stacked exactly once
        # even though the points-axis replicas request the same slice —
        # and nothing else is ever materialized on this process.  Also
        # collective-free, unlike a global-array device_put.
        row_cache: dict = {}

        def rows_for(s: int) -> dict:
            if s not in row_cache:
                row_cache[s] = fetch_rows(shard_ids[s])
            return row_cache[s]

        sharding = NamedSharding(mesh, P(self.axis))

        def make(k):
            gshape = (self.dp, per) + shapes[k]

            def cb(index):
                lo, hi, _ = index[0].indices(self.dp)
                return np.stack([rows_for(s)[k] for s in range(lo, hi)])

            return jax.make_array_from_callback(gshape, sharding, cb)

        self.data = DeviceData(
            pc=make("pc"),
            sn=make("sn") if "sn" in keys else None,
            node=make("node"),
            label=make("label"),
            seg=make("seg") if "seg" in keys else None)
        self.local_items = sorted(
            {int(g) for s in row_cache
             for g in shard_ids[s][: int(self.counts[s])]})
        row_cache.clear()  # free the host copies; HBM holds the split now

    def nbytes_per_shard(self) -> int:
        return sum(x.nbytes for x in jax.tree_util.tree_leaves(self.data)
                   ) // max(self.dp, 1)

    def epoch_index(self, shuffle: bool, epoch: int, batch_size: int):
        """((S, dp, b) LOCAL index table sharded P(None, 'data'),
        per-row valid counts).  Deterministic per (seed, epoch) — every
        process computes the identical table under --distributed."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % self.dp:
            raise ValueError(
                f"--dataset_placement sharded needs batch_size "
                f"({batch_size}) divisible by the data-axis size "
                f"({self.dp})")
        b = batch_size // self.dp
        S = int(self.counts.min()) // b
        if S == 0:
            return None, []
        rng = np.random.default_rng(self.seed + 1000 + epoch)
        table = np.empty((S, self.dp, b), np.int32)
        for s in range(self.dp):
            loc = (rng.permutation(int(self.counts[s])) if shuffle
                   else np.arange(int(self.counts[s])))
            table[:, s, :] = loc[: S * b].reshape(S, b)
        table_dev = jax.device_put(
            table, NamedSharding(self.mesh, P(None, self.axis)))
        return table_dev, [batch_size] * S


class ChunkedDeviceData:
    """Streaming variant of the device-resident pipeline for splits
    bigger than the HBM budget (VERDICT r2 #2).

    The stacked split stays HOST-resident; each epoch is served as a
    sequence of fixed-size super-chunks of items.  A background thread
    stages chunk k+1 (host slice + ``device_put``) while the epoch-scan
    consumes chunk k, so with ``chunk_scan_ms >= transfer_ms`` the
    device never starves — the budget is sized for TWO resident chunks
    (the consumed one and the staging one).

    Epoch semantics match the resident pipeline exactly: one GLOBAL
    shuffle per epoch (same seed recipe as Trainer._device_epoch_index),
    then contiguous chunking — so the batch sequence, the per-step
    train rng (folded from ``state.step``) and therefore the whole
    training trajectory are identical to the resident pipeline (pinned
    by tests/test_device_pipeline.py).  The reference's analogue is the
    8-worker streaming DataLoader (modelnet/train.py:25,
    modelnet_shrec_loader.py:193-202), which never holds the dataset in
    device memory at all — and runs ~40-130x slower than device-side
    augmentation on this host (docs/DESIGN.md)."""

    def __init__(self, dataset_or_host, budget_bytes: int,
                 batch_size: int, device=None, mesh=None, seed: int = 0):
        host = (dataset_or_host if isinstance(dataset_or_host, dict)
                else stack_host_split(dataset_or_host))
        self.host = host
        self.size = host["pc"].shape[0]
        self.seed = seed
        self._put = _make_put(device, mesh)
        self.mesh = mesh
        bpi = max(split_nbytes(host) // max(self.size, 1), 1)
        # two chunks resident (double buffer); at least one batch each
        per_chunk = max(int(budget_bytes) // (2 * bpi), batch_size)
        self.chunk_items = max(per_chunk // batch_size, 1) * batch_size
        self.num_chunks = -(-self.size // self.chunk_items)

    def _table(self, n_rows: int, batch_size: int):
        """Within-chunk index table (S, B) over ``n_rows`` staged rows,
        padded to full batches by repeating the last row; returns
        (table, valids)."""
        B = batch_size
        rows, valids = [], []
        for i in range(0, n_rows, B):
            n = min(B, n_rows - i)
            valids.append(n)
            row = np.arange(i, i + n, dtype=np.int32)
            if n < B:
                row = np.concatenate([row, np.full(B - n, row[-1],
                                                   np.int32)])
            rows.append(row)
        return np.stack(rows), valids

    def _stage(self, ids: np.ndarray, batch_size: int):
        """Slice + ship one chunk; returns (DeviceData, table, valids)."""
        chunk = {k: a[ids] for k, a in self.host.items()}
        table, valids = self._table(len(ids), batch_size)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            table = jax.device_put(
                table, NamedSharding(self.mesh,
                                     P(None, self.mesh.axis_names[0])))
        else:
            table = jnp.asarray(table)
        return _to_device_data(chunk, self._put), table, valids

    def epoch_chunks(self, shuffle: bool, epoch: int, batch_size: int,
                     drop_last: bool):
        """Yield ``(DeviceData, idx_table, valids)`` per chunk, staging
        one chunk ahead on a background thread.

        All chunks except the tail have exactly ``chunk_items`` items;
        with ``drop_last`` the global order is first truncated to a
        multiple of ``batch_size`` (resident-pipeline parity), so only
        the tail chunk compiles a second program shape — constant
        across epochs."""
        import queue as _queue
        import threading

        order = np.arange(self.size)
        if shuffle:
            order = np.random.default_rng(
                self.seed + 1000 + epoch).permutation(self.size)
        if drop_last:
            order = order[: (len(order) // batch_size) * batch_size]
        if len(order) == 0:
            return
        chunks = [order[i:i + self.chunk_items]
                  for i in range(0, len(order), self.chunk_items)]

        if jax.process_count() > 1:
            # --distributed: a device_put onto a cross-process sharding
            # COORDINATES across processes, i.e. it is itself a
            # collective and must be issued in the same order as every
            # other collective on every process.  A background-thread
            # put interleaving with the main thread's collectives aborts
            # the runtime (probed: Gloo 'received data size doesn't
            # match expected size').  Stage on the MAIN thread instead,
            # one chunk ahead — device_put is async, so the transfer of
            # chunk k+1 still overlaps the scan over chunk k.
            nxt = self._stage(chunks[0], batch_size)
            for i in range(len(chunks)):
                cur, nxt = nxt, (self._stage(chunks[i + 1], batch_size)
                                 if i + 1 < len(chunks) else None)
                yield cur
            return

        q: "_queue.Queue" = _queue.Queue(maxsize=1)

        def produce():
            try:
                for ids in chunks:
                    q.put(("ok", self._stage(ids, batch_size)))
            except Exception as e:  # surface staging errors to the consumer
                q.put(("err", e))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True,
                             name="sonet-chunk-stage")
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            kind, payload = item
            if kind == "err":
                raise payload
            yield payload


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
    N = cfg.input_pc_num

    if data.pc.ndim == 4:
        # sharded placement (ShardedDeviceSplit): arrays (dp, per, ...)
        # and idx (dp, b) both sharded over 'data' on axis 0, so the
        # vmapped take is per-shard LOCAL (probed: zero collectives in
        # the compiled HLO); the (dp, b) -> B merge keeps the batch
        # axis data-sharded and the rest of this function identical
        dp, b = idx.shape
        B = dp * b

        def _take(a):
            if a is None:
                return None
            g = jax.vmap(lambda d, i: jnp.take(d, i, axis=0))(a, idx)
            return g.reshape((B,) + g.shape[2:])

        pc, sn, node, label, seg = (_take(data.pc), _take(data.sn),
                                    _take(data.node), _take(data.label),
                                    _take(data.seg))
    else:
        B = idx.shape[0]
        pc = jnp.take(data.pc, idx, axis=0)      # (B, N_raw, D)
        sn = jnp.take(data.sn, idx, axis=0) if data.sn is not None else None
        node = jnp.take(data.node, idx, axis=0)  # (B, M, D)
        label = jnp.take(data.label, idx, axis=0)
        seg = jnp.take(data.seg, idx, axis=0) if data.seg is not None else None
    N_raw = pc.shape[1]

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
    eval_epoch_fn(state, data, epoch_idx (S, B), i0 (int32 scalar))
        -> {metric: (S, ...)} with per-item ``*_i`` arrays (S, B)

    ``i0`` is the global batch counter of the first scanned row — the
    per-batch eval rng folds it in, so the CHUNKED pipeline (which
    scans each super-chunk separately) reproduces the resident
    pipeline's eval subsampling exactly by passing its running offset.
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

    def eval_epoch_fn(state, data: DeviceData, epoch_idx, i0):
        def body(i, idx):
            r = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), i)
            batch = sample_batch(data, idx, r, cfg, train=False)
            m = raw_eval(state, batch)
            # drop per-batch visual payloads: stacking them over S steps
            # wastes HBM; eval aggregation only needs scalars and *_i
            m = {k: v for k, v in m.items()
                 if k.endswith("_i") or (hasattr(v, "ndim") and v.ndim == 0)}
            return i + 1, m

        _, ms = jax.lax.scan(body, jnp.asarray(i0, jnp.int32), epoch_idx)
        return ms

    return (jax.jit(train_epoch_fn, donate_argnums=0),
            jax.jit(eval_epoch_fn))
