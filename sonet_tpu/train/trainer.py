"""Generic epoch-loop trainer — the L5 driver shared by all tasks.

Replaces the four near-identical train scripts of the reference
(modelnet/train.py, shrec16/train.py, part-seg/train.py,
autoencoder/train.py).  Parity points:

* per-epoch eval with batch-size-weighted averaging over true item
  counts (modelnet/train.py:78-90) — padded final batches contribute
  only their valid prefix;
* checkpoint gating on the task metric threshold (modelnet/train.py:96-103,
  part-seg/train.py:110-113) plus optional unconditional per-N-step saves;
* encoder-only --pretrain restore (modelnet/train.py:33-34);
* lr halving and BN momentum decay are folded into the compiled step.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models import build_model
from ..parallel import make_mesh, shard_batch, replicate
from ..parallel.distributed import fetch_global
from ..utils import MetricLogger
from . import checkpoints
from .loops import make_steps
from .state import TrainState, init_state


def build_dataset(cfg: Config, mode: str):
    """Dataset factory keyed on cfg.dataset."""
    if cfg.input_pipeline == "native" and cfg.dataset not in (
            "modelnet", "shrec", "shapenet"):
        import warnings
        warnings.warn(
            f"--input_pipeline native supports the modelnet/shrec/"
            f"shapenet prepared layouts; dataset {cfg.dataset!r} falls "
            f"back to the python host pipeline")
    if cfg.dataset == "synthetic":
        from ..data.synthetic import SyntheticDataset
        mult = 16 if mode == "train" else 4
        return SyntheticDataset(cfg,
                                size=max(cfg.batch_size * mult,
                                         cfg.classes * (4 if mode != "train"
                                                        else 8)),
                                mode=mode, seed=cfg.seed)
    if cfg.dataset == "modelnet":
        if cfg.input_pipeline == "native":
            from ..data.native_loader import NativeModelNetDataset
            return NativeModelNetDataset(cfg.dataroot, mode, cfg)
        from ..data.modelnet import ModelNetDataset
        return ModelNetDataset(cfg.dataroot, mode, cfg)
    if cfg.dataset == "shrec":
        if cfg.input_pipeline == "native":
            from ..data.native_loader import NativeShrecDataset
            return NativeShrecDataset(cfg.dataroot, mode, cfg)
        from ..data.modelnet import ShrecDataset
        return ShrecDataset(cfg.dataroot, mode, cfg)
    if cfg.dataset == "shapenet":
        if cfg.input_pipeline == "native":
            from ..data.native_loader import NativeShapeNetPartDataset
            return NativeShapeNetPartDataset(cfg.dataroot, mode, cfg)
        from ..data.shapenet import ShapeNetPartDataset
        return ShapeNetPartDataset(cfg.dataroot, mode, cfg)
    if cfg.dataset == "mnist":
        from ..data.mnist import MNISTPointCloudDataset
        return MNISTPointCloudDataset(cfg.dataroot, mode, cfg)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def _metric_key(cfg: Config) -> tuple[str, bool]:
    """(metric name, higher_is_better) for checkpoint gating."""
    return {
        "classify": ("accuracy", True),
        "retrieve": ("accuracy", True),
        "segment": ("iou", True),
        "autoencode": ("loss", False),
    }[cfg.task]


class Trainer:
    def __init__(self, cfg: Config, *, log_every: int = 200,
                 out_dir: Optional[str] = None, quiet: bool = False,
                 mesh=None, resume: bool = True):
        import math

        from ..data.pipeline import BatchLoader
        from ..parallel.distributed import is_main, maybe_init_distributed

        # multi-host pods: bring up jax.distributed BEFORE the first
        # device query (parallel/distributed.py; no reference analogue —
        # the reference is single-process single-GPU).  The trainer then
        # runs the same SPMD program on every process; only the console,
        # metric files and checkpoint GC are process-0-owned.
        self.multiprocess = maybe_init_distributed(cfg.distributed)
        self.is_main = (not self.multiprocess) or is_main()
        if self.multiprocess:
            if math.prod(cfg.mesh_shape) <= 1:
                # no explicit mesh: default to pure data-parallel over
                # every chip in the pod
                cfg = cfg.replace(mesh_shape=(jax.device_count(), 1))
            if math.prod(cfg.mesh_shape) != jax.device_count():
                # a partial mesh would leave some process's chips out of
                # the collectives -> deadlock; demand full coverage
                raise ValueError(
                    f"--distributed needs the mesh to cover every device "
                    f"in the pod: mesh_shape {tuple(cfg.mesh_shape)} covers "
                    f"{math.prod(cfg.mesh_shape)} of {jax.device_count()} "
                    f"global devices")
        # --mesh_shape from the CLI/config builds the mesh right here
        # (reference: none — single GPU only, SURVEY.md §2.3); an
        # explicitly passed mesh takes precedence.
        if mesh is None and math.prod(cfg.mesh_shape) > 1:
            # pad a short shape with 1s: `--mesh_shape 8` means 8-way
            # data parallel over the ("data", "points") axes
            shape = tuple(cfg.mesh_shape)
            shape += (1,) * (len(cfg.mesh_axes) - len(shape))
            mesh = make_mesh(shape, cfg.mesh_axes)
        if mesh is not None:
            # keep cfg consistent with the actual mesh: the encoder's
            # shard_map pooling reconstructs the SAME mesh from cfg at
            # trace time (parallel.mesh_for_config), so mesh_shape/axes
            # must describe the mesh actually holding the state
            cfg = cfg.replace(mesh_shape=tuple(mesh.devices.shape),
                              mesh_axes=tuple(mesh.axis_names))
        self.cfg = cfg
        self.mesh = mesh
        self.out_dir = out_dir or os.path.join(cfg.checkpoints_dir, cfg.name)
        os.makedirs(self.out_dir, exist_ok=True)
        if self.is_main:
            cfg.save(os.path.join(self.out_dir, "config.json"))  # opt.txt
        # non-main processes: no metric files (they would collide on a
        # shared checkpoint filesystem), no console chatter
        self.logger = MetricLogger(self.out_dir if self.is_main else None,
                                   quiet=quiet or not self.is_main)
        self.log_every = log_every

        self.train_set = build_dataset(cfg, "train")
        eval_mode = "val" if cfg.dataset == "shrec" else "test"
        self.test_set = build_dataset(cfg, eval_mode)
        self.train_loader = BatchLoader(self.train_set, cfg.batch_size,
                                        shuffle=True, seed=cfg.seed)
        self.test_loader = BatchLoader(self.test_set, cfg.batch_size,
                                       shuffle=False, drop_last=False,
                                       pad_last=True)
        self.steps_per_epoch = max(len(self.train_loader), 1)

        self.model = build_model(cfg)
        batch0 = self._device_batch(next(iter(self.train_loader)))
        extra = (batch0["label"],) if cfg.task == "segment" else ()
        example = (batch0["pc"], batch0.get("sn"), batch0["node"], *extra)
        self.state = init_state(self.model, cfg, jax.random.PRNGKey(cfg.seed),
                                example, steps_per_epoch=self.steps_per_epoch)
        if cfg.pretrain:
            self.state = checkpoints.restore_encoder(cfg.pretrain, self.state)
        # auto-resume from the latest full checkpoint (SURVEY.md §5:
        # the reference loses progress on crash; orbax restore covers it)
        latest = checkpoints.latest_checkpoint(
            os.path.join(self.out_dir, "ckpt"))
        if resume and latest:
            self.state = checkpoints.restore_checkpoint(latest, self.state)
            if self.is_main:
                print(f"resumed from {latest} at step "
                      f"{int(self.state.step)}")
        if self.mesh is not None:
            self.state = replicate(self.state, self.mesh)
        self.train_step, self.eval_step = make_steps(self.model, cfg,
                                                     self.steps_per_epoch)
        # device-resident pipeline (data/device_pipeline.py): the whole
        # split lives in HBM and subsample+augment fuse into the step
        # jit.  --device_budget_gb bounds HBM use: an over-budget split
        # automatically degrades to chunked streaming (host-resident
        # split, double-buffered super-chunks) instead of OOMing.
        self.device_train = self.device_eval = None
        if cfg.input_pipeline == "device":
            from ..data.device_pipeline import (ChunkedDeviceData,
                                                ShardedDeviceSplit,
                                                device_data_from_host,
                                                estimate_split_nbytes,
                                                make_device_epoch_fns,
                                                split_nbytes,
                                                stack_host_split)
            budget = int(cfg.device_budget_gb * 1e9)
            if cfg.dataset_placement not in ("replicated", "sharded"):
                raise ValueError(
                    f"--dataset_placement {cfg.dataset_placement!r}: want "
                    f"'replicated' or 'sharded'")
            if cfg.dataset_placement == "sharded" and self.mesh is None:
                # don't silently unmeet the user's placement ask (ADVICE
                # r3): sharded needs a mesh data axis to split over
                if self.is_main:
                    print("device pipeline: --dataset_placement sharded "
                          "needs a mesh (--mesh_shape); using replicated "
                          "placement on the single device", flush=True)

            def build(dataset, what):
                # under a mesh: dataset replicated, index table sharded
                # over 'data' (see load_device_data docstring) — unless
                # --dataset_placement sharded splits the TRAIN items
                # over the data axis (eval keeps per-item metric order)
                if (cfg.dataset_placement == "sharded" and what == "train"
                        and self.mesh is not None):
                    # budget check from ONE raw item so the sharded path
                    # never stacks the full split on any host — each
                    # process materializes only its own shards' items
                    # (ShardedDeviceSplit per-process loading)
                    dp = int(self.mesh.shape[self.mesh.axis_names[0]])
                    est = estimate_split_nbytes(dataset)
                    if budget > 0 and est // max(dp, 1) > budget:
                        if self.is_main:
                            print(f"device pipeline [{what}]: even sharded "
                                  f"over {dp} chips the split exceeds "
                                  f"--device_budget_gb "
                                  f"{cfg.device_budget_gb:g} — falling back "
                                  f"to chunked streaming", flush=True)
                    else:
                        sd = ShardedDeviceSplit(dataset, self.mesh,
                                                seed=cfg.seed)
                        if self.is_main:
                            print(f"device pipeline [{what}]: sharded over "
                                  f"{sd.dp} data shards of ~{sd.per} items "
                                  f"({sd.nbytes_per_shard() / 1e9:.2f} "
                                  f"GB/chip; this process stacked "
                                  f"{len(sd.local_items)} items)",
                                  flush=True)
                        return sd
                host = stack_host_split(dataset)
                nbytes = split_nbytes(host)
                if budget > 0 and nbytes > budget:
                    cd = ChunkedDeviceData(host, budget, cfg.batch_size,
                                           mesh=self.mesh, seed=cfg.seed)
                    if self.is_main:
                        print(f"device pipeline [{what}]: split "
                              f"{nbytes / 1e9:.2f} GB exceeds "
                              f"--device_budget_gb {cfg.device_budget_gb:g} "
                              f"— streaming {cd.num_chunks} chunks of "
                              f"{cd.chunk_items} items (double-buffered)",
                              flush=True)
                    return cd
                return device_data_from_host(host, mesh=self.mesh)

            self.device_train = build(self.train_set, "train")
            self.device_eval = build(self.test_set, "eval")
            self.train_epoch_dev, self.eval_epoch_dev = \
                make_device_epoch_fns(self.model, cfg, self.steps_per_epoch)
        self.rng = jax.random.PRNGKey(cfg.seed + 1)
        self.best_metric = None
        self._stop_requested = False

    # ------------------------------------------------------------------
    def _device_batch(self, batch) -> Dict[str, jax.Array]:
        b = {k: v for k, v in batch.items() if k != "valid"}
        if self.mesh is not None:
            return shard_batch(b, self.mesh)
        return {k: jnp.asarray(v) for k, v in b.items()}

    def _prefetch(self, loader, depth: int = 2):
        """Host->device transfer on a background thread, `depth` batches
        ahead, so augmentation/IO overlaps device compute (the reference
        relied on DataLoader workers for this, modelnet/train.py:25).

        Under --distributed the transfers move to the MAIN thread: a
        device_put onto a cross-process sharding is itself a collective
        and must keep program order with the step/metric collectives
        (docs/DESIGN.md multi-host section; a threaded put aborts the
        runtime). The BatchLoader's own worker threads are unaffected —
        they produce host numpy only."""
        if self.multiprocess:
            for batch in loader:
                valid = int(batch.pop("valid", self.cfg.batch_size))
                yield self._device_batch(batch), valid
            return
        import queue as _queue
        import threading

        q: "_queue.Queue" = _queue.Queue(maxsize=depth)

        def produce():
            for batch in loader:
                valid = int(batch.pop("valid", self.cfg.batch_size))
                q.put((self._device_batch(batch), valid))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item

    def _device_epoch_index(self, data, shuffle: bool, epoch: int):
        """((S, B) index table, per-row valid counts) for one epoch over
        a device-resident split.  Ships in ONE host->device transfer;
        the epoch program scans it (per-step dispatch on a remote chip
        costs ~1-20 ms of round-trip latency each)."""
        from ..data.device_pipeline import ShardedDeviceSplit
        if isinstance(data, ShardedDeviceSplit):
            return data.epoch_index(shuffle, epoch, self.cfg.batch_size)
        T, B = data.size, self.cfg.batch_size
        order = np.arange(T)
        if shuffle:
            order = np.random.default_rng(
                self.cfg.seed + 1000 + epoch).permutation(T)
            order = order[: (T // B) * B]  # drop last, like the train loader
        valids = []
        rows = []
        for i in range(0, len(order), B):
            chunk = order[i:i + B]
            valids.append(len(chunk))
            if len(chunk) < B:  # pad by repeating the last item
                chunk = np.concatenate([chunk,
                                        np.full(B - len(chunk), chunk[-1])])
            rows.append(chunk)
        if not rows:
            return None, []
        table = np.stack(rows).astype(np.int32)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.device_put(
                table, NamedSharding(self.mesh,
                                     P(None, self.cfg.mesh_axes[0]))), valids
        return jnp.asarray(table), valids

    def _is_chunked(self, data) -> bool:
        from ..data.device_pipeline import ChunkedDeviceData
        return isinstance(data, ChunkedDeviceData)

    @staticmethod
    def _dev_arrays(data):
        """The jit-traceable DeviceData pytree behind a device split
        (ShardedDeviceSplit wraps its arrays; the rest ARE the pytree)."""
        from ..data.device_pipeline import ShardedDeviceSplit
        return data.data if isinstance(data, ShardedDeviceSplit) else data

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        t0 = time.perf_counter()
        metrics = None
        steps = 0
        if self.device_train is not None and self._is_chunked(
                self.device_train):
            # chunked streaming: one epoch-scan dispatch per super-chunk,
            # the next chunk staging host-side while this one runs
            parts = []
            for dd, table, _valids in self.device_train.epoch_chunks(
                    True, epoch, self.cfg.batch_size, drop_last=True):
                self.state, ms = self.train_epoch_dev(
                    self.state, dd, table, self.rng)
                parts.append(fetch_global(ms))
                steps += len(table)
            if parts:
                ms = {k: np.concatenate([p[k] for p in parts])
                      for k in parts[0]}
                for i in range(0, steps, self.log_every):
                    self.logger.log(int(self.state.step) - steps + i + 1,
                                    {k: float(v[i]) for k, v in ms.items()},
                                    epoch=epoch, prefix="train_")
                metrics = {k: v[-1] for k, v in ms.items()}
        elif self.device_train is not None:
            epoch_idx, _valids = self._device_epoch_index(
                self.device_train, True, epoch)
            if epoch_idx is not None:
                self.state, ms = self.train_epoch_dev(
                    self.state, self._dev_arrays(self.device_train),
                    epoch_idx, self.rng)
                ms = fetch_global(ms)  # one sync (all-gather if multihost)
                steps = len(epoch_idx)
                for i in range(0, steps, self.log_every):
                    self.logger.log(int(self.state.step) - steps + i + 1,
                                    {k: float(v[i]) for k, v in ms.items()},
                                    epoch=epoch, prefix="train_")
                metrics = {k: v[-1] for k, v in ms.items()}
        else:
            for i, (db, valid) in enumerate(
                    self._prefetch(self.train_loader)):
                self.state, metrics = self.train_step(self.state, db,
                                                      self.rng)
                steps += 1
                if i % self.log_every == 0:
                    self.logger.log(int(self.state.step),
                                    {k: float(v) for k, v in metrics.items()},
                                    epoch=epoch, prefix="train_")
                if self._should_stop():  # per-step granularity on the
                    break                 # host pipeline; device epochs
                                          # stop at the epoch boundary
        if metrics is None:  # dataset smaller than one batch
            return {"sec_per_step": 0.0}
        # fetch forces completion: dispatch-only timing lies on remote
        # backends (CLAUDE.md), so per-step time = synced epoch wall clock
        last = {k: float(v) for k, v in metrics.items()}
        last["sec_per_step"] = (time.perf_counter() - t0) / steps
        return last

    @staticmethod
    def _fetch_eval(ms):
        """fetch_global only what evaluate() consumes from the device-
        eval path: per-item ``*_i`` columns and per-step scalars.  The
        stacked visual payloads (score/predicted_pc, (S, B, C...)) are
        never read there (db=None skips _save_visuals), so shipping
        them host-side — or all-gathering them across a pod — is pure
        waste (ADVICE r3)."""
        return fetch_global({k: v for k, v in ms.items()
                             if k.endswith("_i")
                             or getattr(v, "ndim", 0) <= 1})

    def _eval_batches(self):
        if self.device_eval is not None and self._is_chunked(
                self.device_eval):
            i0 = 0
            for dd, table, valids in self.device_eval.epoch_chunks(
                    False, 0, self.cfg.batch_size, drop_last=False):
                ms = self.eval_epoch_dev(self.state, dd, table,
                                         jnp.asarray(i0, jnp.int32))
                i0 += len(table)
                ms = self._fetch_eval(ms)
                for i, valid in enumerate(valids):
                    yield None, {k: v[i] for k, v in ms.items()}, valid
        elif self.device_eval is not None:
            epoch_idx, valids = self._device_epoch_index(
                self.device_eval, False, 0)
            if epoch_idx is None:
                return
            ms = self.eval_epoch_dev(self.state, self.device_eval,
                                     epoch_idx, jnp.asarray(0, jnp.int32))
            ms = self._fetch_eval(ms)  # one sync (all-gather if multihost)
            for i, valid in enumerate(valids):
                yield None, {k: v[i] for k, v in ms.items()}, valid
        else:
            for db, valid in self._prefetch(self.test_loader):
                yield db, self.eval_step(self.state, db), valid

    def evaluate(self, visualize: bool = False) -> Dict[str, float]:
        """Batch-size-weighted eval (modelnet/train.py:78-90)."""
        sums: Dict[str, float] = {}
        count = 0
        first = True
        for db, m, valid in self._eval_batches():
            # visuals index into per-batch arrays, which are global-
            # sharded under --distributed; skip them there (the metric
            # files and dashboard remain the multi-host observability)
            if (visualize and first and db is not None
                    and not self.multiprocess):
                self._save_visuals(db, m)
                first = False
            count += valid
            for k in list(m.keys()):
                if k.endswith("_i"):
                    # selective fetch: only the per-item metric columns
                    # come host-side (all-gathered under --distributed);
                    # visual payloads (score/predicted_pc) stay on device
                    arr = np.asarray(fetch_global(m[k]))[:valid]
                    name = {"loss_i": "loss", "correct_i": "accuracy",
                            "iou_i": "iou"}.get(k, k[:-2])
                    if self.cfg.task == "segment" and k == "correct_i":
                        name = "seg_accuracy"
                    sums[name] = sums.get(name, 0.0) + float(arr.sum())
        return {k: v / max(count, 1) for k, v in sums.items()}

    def _save_visuals(self, batch, metrics) -> None:
        """Eval-time renders (the reference's per-epoch visdom displays:
        AE reconstructions autoencoder/train.py:75-76, seg colorings
        segmenter.py:135-155)."""
        from ..utils.visualize import (HTMLGallery, save_point_cloud_png,
                                       save_seg_comparison)
        out = os.path.join(self.out_dir, "visuals")
        gallery = HTMLGallery(out)
        step = int(self.state.step)
        paths = []
        if self.cfg.task == "autoencode" and "predicted_pc" in metrics:
            paths.append(save_point_cloud_png(
                os.path.join(out, f"step{step}_input.png"),
                np.asarray(batch["pc"][0]), title="input"))
            paths.append(save_point_cloud_png(
                os.path.join(out, f"step{step}_recon.png"),
                np.asarray(metrics["predicted_pc"][0]), title="recon"))
        elif self.cfg.task == "segment" and "score" in metrics:
            pred = np.asarray(jnp.argmax(metrics["score"][0], -1))
            paths += save_seg_comparison(
                out, f"step{step}", np.asarray(batch["pc"][0]), pred,
                np.asarray(batch["seg"][0]), dataroot=self.cfg.dataroot)
        if paths:
            gallery.add_row(f"step {step}", paths)
            gallery.save()

    def maybe_checkpoint(self, epoch: int, test_metrics: Dict[str, float],
                         threshold: Optional[float] = None) -> Optional[str]:
        key, hib = _metric_key(self.cfg)
        val = test_metrics.get(key)
        if val is None:
            return None
        improved = (self.best_metric is None
                    or (val > self.best_metric if hib
                        else val < self.best_metric))
        if improved:
            self.best_metric = val
        gate = True if threshold is None else (
            val > threshold if hib else val < threshold)
        if improved and gate:
            return checkpoints.save_checkpoint(
                os.path.join(self.out_dir, "ckpt"), self.state,
                int(self.state.step))
        return None

    def _should_stop(self) -> bool:
        """Stop decision, made COLLECTIVELY under --distributed: an
        orchestrator may deliver SIGTERM to one process only; if that
        process broke out of the epoch loop alone the rest would hang in
        the next collective.  Any process's stop request stops all.
        Called at aligned points (same count on every process)."""
        if not self.multiprocess:
            return self._stop_requested
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray(self._stop_requested))
        return bool(np.any(flags))

    def request_stop(self) -> None:
        """Ask fit() to stop at the next epoch boundary: it checkpoints
        the full train state first, so a restart auto-resumes exactly
        where it left off (the reference loses everything on SIGTERM —
        its saves are metric-gated only, modelnet/train.py:96-103)."""
        self._stop_requested = True

    def _install_signal_handlers(self):
        """SIGTERM/SIGINT -> graceful stop (preemption-safe training);
        a second SIGINT raises KeyboardInterrupt as usual.  No-op off
        the main thread (signal.signal would raise)."""
        import signal

        def handler(signum, frame):
            if self._stop_requested and signum == signal.SIGINT:
                raise KeyboardInterrupt
            self._stop_requested = True
            print("stop requested: checkpointing at the next epoch "
                  "boundary (again to force-quit)", flush=True)

        prev = {}
        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                prev[sig] = signal.signal(sig, handler)
        except ValueError:  # not the main thread
            return {}
        return prev

    def fit(self, epochs: Optional[int] = None,
            save_threshold: Optional[float] = None,
            visualize_every: int = 0) -> Dict[str, float]:
        import signal

        epochs = epochs if epochs is not None else self.cfg.epochs
        test_metrics: Dict[str, float] = {}
        ckpt_bucket = 0  # last step // checkpoint_every already saved
        prev_handlers = self._install_signal_handlers()
        try:
            for epoch in range(epochs):
                tr = self.train_epoch(epoch)
                viz = visualize_every > 0 and epoch % visualize_every == 0
                test_metrics = self.evaluate(visualize=viz)
                self.logger.log(int(self.state.step), test_metrics,
                                epoch=epoch, prefix="test_")
                saved = self.maybe_checkpoint(epoch, test_metrics,
                                              threshold=save_threshold)
                # --checkpoint_every N: ungated periodic saves every N
                # steps, checked at epoch boundaries (with the epoch-scan
                # pipeline the host only holds state between epochs) — in
                # addition to the reference-style metric-gated saves above
                if self.cfg.checkpoint_every > 0:
                    bucket = int(self.state.step) // self.cfg.checkpoint_every
                    if bucket > ckpt_bucket:
                        ckpt_bucket = bucket
                        if saved is None:  # gated save wrote this step
                            saved = checkpoints.save_checkpoint(
                                os.path.join(self.out_dir, "ckpt"),
                                self.state, int(self.state.step))
                if self._should_stop():
                    if saved is None:  # ungated: resume must not regress
                        checkpoints.save_checkpoint(
                            os.path.join(self.out_dir, "ckpt"), self.state,
                            int(self.state.step))
                    self.logger.log(int(self.state.step),
                                    {"stopped_early": 1.0}, epoch=epoch,
                                    prefix="train_")
                    break
        finally:
            for sig, h in prev_handlers.items():
                signal.signal(sig, h)
            # a consumed stop must not silently truncate a LATER fit()
            # on the same Trainer (retry drivers, interactive resume)
            self._stop_requested = False
        return test_metrics
