"""AOT model export: self-contained serving artifacts via ``jax.export``.

Beyond-reference capability (the reference's only deployment story is
re-loading ``.pth`` files inside the training codebase,
shrec16/test.py:31-32).  A finished training run — the directory
``Trainer`` writes (``config.json`` + ``ckpt/``) — is exported as a
*self-contained* artifact: the eval-mode forward pass with parameters
and BatchNorm statistics baked in as constants, lowered to StableHLO
and serialized with ``jax.export``.  Loading the artifact needs only
``jax`` — none of this package's model code — and runs on every
platform it was lowered for.

Artifact layout (a directory)::

    model.stablehlo   serialized jax.export blob (params embedded)
    manifest.json     task, input signature, output meaning, platforms,
                      jax version, source checkpoint

Calling convention (all arrays batch-major, spatial dim D=3, or 2 for
MNIST; shapes are those recorded in ``manifest["inputs"]``):

    classify/retrieve:  (pc, sn, node)          -> score  (B, classes)
    segment:            (pc, sn, node, label)   -> score  (B, N, classes)
    autoencode:         (pc, sn, node)          -> pc_out (B, output_pc_num, 3)

Portability note: the production TPU pooling path is a Pallas (Mosaic)
kernel, which lowers to a TPU-only custom call.  Exports whose platform
list includes ``cpu`` therefore force the pure-XLA ``scatter`` pooling
path so the artifact is plain StableHLO and runs anywhere; a
``tpu``-only export keeps the fast kernel.  Both are numerically
cross-checked in tests/test_export.py.

``export_run(..., poly_batch=True)`` exports an any-batch-size artifact
(manifest shapes carry ``None``).  Two strategies, picked by platform:

- **bucketed** (default when ``cpu`` is NOT in the platform list): one
  fixed-shape blob per power-of-2 batch bucket up to the compiled batch
  (``model_b1.stablehlo`` .. ``model_b{B}.stablehlo``).  Static shapes
  keep the fast Pallas pooling kernel in every bucket; a request pads
  to the smallest covering bucket and chunks above the largest.  Cost:
  the parameters are embedded once per bucket, so the artifact is
  ~len(buckets)× the single-blob size.
- **symbolic** (when ``cpu`` is in the platform list, i.e. portable
  artifacts): one blob with a symbolic batch dimension.  Smallest
  artifact, runs anywhere, but shape polymorphism rules out the Pallas
  kernel (scatter pooling) and each dispatched batch size compiles at
  load time (``ServingEngine`` pads to power-of-2 buckets to bound
  that).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from typing import Any, Callable, Optional

import numpy as np

from .config import Config, load_config

ARTIFACT_BLOB = "model.stablehlo"
ARTIFACT_MANIFEST = "manifest.json"


def batch_buckets(max_batch: int) -> list:
    """Power-of-2 batch buckets covering ``1..max_batch`` (ascending,
    always ends exactly at ``max_batch``): 8 -> [1, 2, 4, 8];
    6 -> [1, 2, 4, 6]."""
    if max_batch < 1:
        raise ValueError(f"max_batch must be >= 1, got {max_batch}")
    out = []
    b = 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


def _spatial_dim(cfg: Config) -> int:
    return 2 if cfg.dataset == "mnist" else 3


def input_signature(cfg: Config, batch_size: Optional[int] = None):
    """(name, shape, dtype) triples of the serving inputs for ``cfg``."""
    B = batch_size or cfg.batch_size
    D = _spatial_dim(cfg)
    sig = [("pc", (B, cfg.input_pc_num, D), "float32"),
           ("sn", (B, cfg.input_pc_num, D), "float32"),
           ("node", (B, cfg.node_num, D), "float32")]
    if cfg.task == "segment":
        sig.append(("label", (B,), "int32"))
    return sig


def build_serve_fn(model, cfg: Config, params, batch_stats) -> Callable:
    """Pure eval-mode forward with variables closed over (they become
    constants of the exported program)."""
    variables: dict[str, Any] = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    if cfg.task == "segment":
        def serve(pc, sn, node, label):
            score, _ = model.apply(variables, pc, sn, node, label,
                                   train=False)
            return score
    elif cfg.task == "autoencode":
        def serve(pc, sn, node):
            dec, _ = model.apply(variables, pc, sn, node, train=False)
            return dec.pc
    else:  # classify / retrieve (retrieval serves the score vector as key)
        def serve(pc, sn, node):
            score, _ = model.apply(variables, pc, sn, node, train=False)
            return score
    return serve


def _restore_run(run_dir: str, batch_size: Optional[int] = None,
                 checkpoint: Optional[str] = None,
                 pooling: Optional[str] = None,
                 mesh_shape: Optional[tuple] = None):
    """Restore a finished run for serving: ``(cfg, model, state, ckpt)``.

    ``mesh_shape`` is the SERVING mesh (data[, points]) — independent of
    whatever the run trained on.  Under a >1-device mesh the fast
    pooling kernel runs per shard inside shard_map (the encoder
    reconstructs the mesh from cfg via parallel.mesh_for_config)."""
    import jax
    import jax.numpy as jnp

    from . import train
    from .models import build_model

    cfg = load_config(os.path.join(run_dir, "config.json"))
    if batch_size:
        cfg = cfg.replace(batch_size=batch_size)
    if mesh_shape:
        cfg = cfg.replace(mesh_shape=tuple(mesh_shape),
                          mesh_axes=("data", "points"))
    else:
        cfg = cfg.replace(mesh_shape=(1, 1))
    if pooling:
        cfg = cfg.replace(pooling=pooling)

    sig = input_signature(cfg, cfg.batch_size)
    example = tuple(jnp.zeros(s, d) for _, s, d in sig)
    model = build_model(cfg)
    state = train.init_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                             example)
    ckpt = checkpoint or train.latest_checkpoint(os.path.join(run_dir, "ckpt"))
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint found under {run_dir}/ckpt")
    state = train.restore_checkpoint(ckpt, state)
    return cfg, model, state, ckpt


_OUTPUT_DOC = {"classify": "score (B, classes)",
               "retrieve": "score (B, classes)",
               "segment": "per-point score (B, N, classes)",
               "autoencode": "reconstructed cloud (B, P, 3)"}


def export_run(run_dir: str, out_dir: Optional[str] = None,
               batch_size: Optional[int] = None,
               checkpoint: Optional[str] = None,
               platforms: Optional[list[str]] = None,
               poly_batch: bool = False,
               bucketed: Optional[bool] = None) -> dict:
    """Export a finished run as a serving artifact; returns the manifest.

    ``platforms`` defaults to the current backend.  Any list containing
    ``cpu`` forces the portable pure-XLA pooling path (see module doc).

    ``poly_batch=True`` exports an any-batch-size artifact, recorded as
    ``None`` in the manifest's input shapes.  On non-cpu platform lists
    it emits per-bucket fixed-shape blobs that keep the fast Pallas
    pooling kernel (see module doc, "bucketed"); with ``cpu`` in the
    list it falls back to one symbolic-batch blob on the portable
    scatter path (shape polymorphism rules out the Pallas kernel).
    ``bucketed`` overrides that platform-keyed default — e.g.
    ``bucketed=True`` with cpu platforms still emits per-bucket blobs
    (portable pooling, but fixed shapes: no load-time recompiles).
    """
    import jax
    from jax import export as jexport

    from .nn.encoder import resolve_pooling

    platforms = [p.lower() for p in (platforms or [jax.default_backend()])]
    if bucketed is None:
        bucketed = poly_batch and "cpu" not in platforms
    bucketed = bucketed and poly_batch  # meaningless without poly_batch
    portable = "cpu" in platforms or (poly_batch and not bucketed)
    cfg, model, state, ckpt = _restore_run(
        run_dir, batch_size, checkpoint,
        pooling=("scatter" if portable else None))
    sig = input_signature(cfg, cfg.batch_size)

    serve = build_serve_fn(model, cfg, state.params, state.batch_stats)
    out_dir = out_dir or os.path.join(run_dir, "export")
    os.makedirs(out_dir, exist_ok=True)

    buckets = None
    blobs = None
    if poly_batch and bucketed:
        # one fixed-shape export per power-of-2 batch bucket: static
        # shapes keep the fast pooling kernel in every bucket
        buckets = batch_buckets(cfg.batch_size)
        blobs = {}
        total = 0
        for b in buckets:
            specs = [jax.ShapeDtypeStruct((b,) + tuple(s[1:]), d)
                     for _, s, d in sig]
            exported = jexport.export(jax.jit(serve),
                                      platforms=platforms)(*specs)
            blob = bytes(exported.serialize())
            fname = f"model_b{b}.stablehlo"
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(blob)
            blobs[str(b)] = fname
            total += len(blob)
        manifest_shapes = [[None] + list(s[1:]) for _, s, _ in sig]
        blob_bytes = total
    else:
        if poly_batch:
            b, = jexport.symbolic_shape("b")
            specs = [jax.ShapeDtypeStruct((b,) + tuple(s[1:]), d)
                     for _, s, d in sig]
            manifest_shapes = [[None] + list(s[1:]) for _, s, _ in sig]
        else:
            specs = [jax.ShapeDtypeStruct(s, d) for _, s, d in sig]
            manifest_shapes = [list(s) for _, s, _ in sig]
        exported = jexport.export(jax.jit(serve), platforms=platforms)(*specs)
        blob = bytes(exported.serialize())
        with open(os.path.join(out_dir, ARTIFACT_BLOB), "wb") as f:
            f.write(blob)
        blob_bytes = len(blob)

    manifest = {
        "task": cfg.task,
        "inputs": [{"name": n, "shape": ms, "dtype": d}
                   for (n, _, d), ms in zip(sig, manifest_shapes)],
        "poly_batch": poly_batch,
        "output": _OUTPUT_DOC[cfg.task],
        "platforms": platforms,
        "pooling": ("scatter" if portable else resolve_pooling(cfg)),
        "classes": cfg.classes,
        "checkpoint": ckpt,
        "jax_version": jax.__version__,
        "blob_bytes": blob_bytes,
    }
    if buckets is not None:
        manifest["buckets"] = buckets
        manifest["blobs"] = blobs
    with open(os.path.join(out_dir, ARTIFACT_MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(artifact_dir: str):
    """Load a serving artifact: returns ``(fn, manifest)``.

    ``fn(*arrays)`` runs the exported program on the current default
    device (which must be in ``manifest['platforms']``).  Needs only
    jax — no sonet_tpu model code, config, or checkpoint.
    """
    from jax import export as jexport

    def _read(fname):
        with open(os.path.join(artifact_dir, fname), "rb") as f:
            return jexport.deserialize(bytearray(f.read()))

    with open(os.path.join(artifact_dir, ARTIFACT_MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("buckets"):
        # bucketed poly artifact: pick the smallest covering bucket per
        # chunk, pad (replicating the last row — per-item outputs are
        # batch-independent in eval mode), chunk above the largest
        progs = {int(b): _read(f) for b, f in manifest["blobs"].items()}
        b_max = max(progs)

        def _call(cast):
            B_req = cast[0].shape[0]
            outs = []
            for s in range(0, B_req, b_max):
                chunk = [a[s:s + b_max] for a in cast]
                n = chunk[0].shape[0]
                b = min(x for x in progs if x >= n)
                if b != n:
                    chunk = [np.concatenate(
                        [a, np.repeat(a[-1:], b - n, axis=0)])
                        for a in chunk]
                outs.append(np.asarray(progs[b].call(*chunk))[:n])
            return outs[0] if len(outs) == 1 else np.concatenate(outs,
                                                                 axis=0)
    else:
        exported = _read(ARTIFACT_BLOB)

        def _call(cast):
            return exported.call(*cast)

    def fn(*arrays):
        expect = manifest["inputs"]
        if len(arrays) != len(expect):
            names = [i["name"] for i in expect]
            raise ValueError(f"expected {len(expect)} inputs {names}, "
                             f"got {len(arrays)}")
        cast = [np.asarray(a, i["dtype"]) for a, i in zip(arrays, expect)]
        for a, i in zip(cast, expect):
            want = i["shape"]  # None = symbolic (poly_batch export)
            if len(a.shape) != len(want) or any(
                    w is not None and w != g for w, g in zip(want, a.shape)):
                raise ValueError(f"input {i['name']}: expected shape "
                                 f"{want}, got {list(a.shape)}")
        if manifest.get("poly_batch"):
            sizes = {a.shape[0] for a in cast}
            if len(sizes) > 1:
                raise ValueError("inconsistent batch sizes across inputs: "
                                 f"{[a.shape[0] for a in cast]}")
            if 0 in sizes:
                # jax.export dimension variables are constrained >= 1;
                # fail here with a clear message instead of a symbolic
                # shape-constraint error naming 'b'
                raise ValueError("empty request batch (B=0); poly_batch "
                                 "artifacts require B >= 1")
        return _call(cast)

    return fn, manifest


class ServingEngine:
    """Request-level serving wrapper over a compiled fixed-batch forward.

    The compiled program has a FIXED batch size ``B`` (XLA static
    shapes); ``predict`` accepts any request batch ``B'`` by chunking
    into ``ceil(B'/B)`` calls and padding the final chunk (padding rows
    replicate the last item and are sliced off — per-item outputs are
    batch-independent in eval mode, pinned by tests/test_serve.py).
    Device dispatch is serialized with a lock (one chip, one program);
    chunk preparation and response encoding run outside it.

    Construct with :meth:`from_artifact` (an ``export_run`` directory;
    needs only jax) or :meth:`from_run` (a run directory; restores the
    checkpoint in-process and keeps the current backend's fast pooling
    path).  ``tasks/serve.py`` wraps this in an HTTP daemon.
    """

    def __init__(self, fn: Callable, manifest: dict):
        self._fn = fn
        self.manifest = manifest
        self._lock = threading.Lock()        # device dispatch
        self._stats_lock = threading.Lock()  # traffic counters
        self._batcher: Optional[_MicroBatcher] = None
        self.requests = 0
        self.items = 0
        self.dispatches = 0
        self.coalesced = 0  # requests that shared a dispatch with others
        self.total_s = 0.0

    # -- constructors -------------------------------------------------------

    @classmethod
    def from_artifact(cls, artifact_dir: str) -> "ServingEngine":
        fn, manifest = load_exported(artifact_dir)
        return cls(fn, manifest)

    @classmethod
    def from_run(cls, run_dir: str, batch_size: Optional[int] = None,
                 checkpoint: Optional[str] = None,
                 mesh_shape: Optional[tuple] = None) -> "ServingEngine":
        """``mesh_shape=(data[, points])`` serves over a device mesh: a
        run trained on one chip serves on N — state replicated, request
        batch sharded over 'data' and points over 'points' (XLA inserts
        the collectives; same layout as tasks/infer.py)."""
        import jax

        from .nn.encoder import resolve_pooling

        mesh = None
        shape = None
        if mesh_shape:
            from .parallel import normalize_mesh_shape
            shape = normalize_mesh_shape(mesh_shape)
        cfg, model, state, ckpt = _restore_run(
            run_dir, batch_size, checkpoint, mesh_shape=shape)
        if shape:
            from .parallel import check_mesh_divisible, make_mesh, replicate
            check_mesh_divisible(shape, cfg.batch_size, cfg.input_pc_num)
            mesh = make_mesh(shape, ("data", "points"))
            state = replicate(state, mesh)
        serve = jax.jit(build_serve_fn(model, cfg, state.params,
                                       state.batch_stats))
        if mesh is not None:
            from .parallel import shard_batch
            names = [n for n, _, _ in input_signature(cfg, cfg.batch_size)]
            inner = serve

            def serve(*arrays):  # noqa: F811 — mesh-sharding wrapper
                b = shard_batch(dict(zip(names, arrays)), mesh)
                return inner(*(b[n] for n in names))
        manifest = {
            "task": cfg.task,
            "inputs": [{"name": n, "shape": list(s), "dtype": d}
                       for n, s, d in input_signature(cfg, cfg.batch_size)],
            "output": _OUTPUT_DOC[cfg.task],
            "platforms": [jax.default_backend()],
            "pooling": resolve_pooling(cfg),
            "classes": cfg.classes,
            "checkpoint": ckpt,
            "source": "run",
            "mesh_shape": (list(mesh.devices.shape) if mesh is not None
                           else None),
        }
        return cls(serve, manifest)

    # -- serving ------------------------------------------------------------

    @property
    def batch_size(self) -> Optional[int]:
        """Compiled batch size; None for a poly_batch artifact (any)."""
        return self.manifest["inputs"][0]["shape"][0]

    @property
    def input_names(self) -> list:
        return [i["name"] for i in self.manifest["inputs"]]

    def predict(self, inputs: dict) -> np.ndarray:
        """Run the model on named arrays; returns the stacked output.

        ``inputs`` maps input name -> array of shape ``(B', *item)`` for
        any ``B' >= 1`` (see class doc for the chunk/pad semantics).
        """
        expect = self.manifest["inputs"]
        missing = [i["name"] for i in expect if i["name"] not in inputs]
        if missing:
            raise ValueError(f"missing inputs {missing} "
                             f"(want {self.input_names})")
        arrays, B_req = [], None
        for spec in expect:
            try:
                a = np.asarray(inputs[spec["name"]], spec["dtype"])
            except (TypeError, ValueError) as e:
                raise ValueError(f"input {spec['name']}: not convertible "
                                 f"to {spec['dtype']}: {e}") from None
            want = spec["shape"]
            if a.ndim != len(want) or list(a.shape[1:]) != want[1:]:
                raise ValueError(
                    f"input {spec['name']}: expected shape "
                    f"(B, {', '.join(map(str, want[1:]))}), "
                    f"got {list(a.shape)}")
            if B_req is None:
                B_req = a.shape[0]
            elif a.shape[0] != B_req:
                raise ValueError(
                    f"inconsistent batch sizes: {spec['name']} has "
                    f"{a.shape[0]}, expected {B_req}")
            arrays.append(a)
        if not B_req:
            raise ValueError("empty request batch")

        t0 = time.perf_counter()
        batcher = self._batcher  # racy vs stop_microbatch: read once
        if (batcher is not None
                and (self.batch_size is None or B_req < self.batch_size)):
            out = batcher.submit(arrays, B_req)
        else:
            out = self._dispatch(arrays, B_req)
        with self._stats_lock:
            self.requests += 1
            self.items += B_req
            self.total_s += time.perf_counter() - t0
        return out

    def _dispatch(self, arrays: list, B_req: int) -> np.ndarray:
        """Run validated arrays through the compiled program (the
        chunk/pad core); serialized on the device lock."""
        B = self.batch_size
        outs = []
        with self._lock:
            if B is None:
                # poly_batch artifact: one dispatch, any B'.  A BUCKETED
                # artifact pads/chunks to its own blob set inside fn; a
                # symbolic one compiles per distinct dispatched size, so
                # pad B' up to a power-of-2 bucket here (padding
                # replicates the last item, sliced off below) — bounds
                # compiles at log2(max B') instead of one per distinct
                # request size; warmup covers bucket 1 only, other
                # buckets compile on first use.
                if not self.manifest.get("buckets"):
                    Bp = 1 << max(B_req - 1, 0).bit_length()
                    if Bp != B_req:
                        arrays = [np.concatenate(
                            [a, np.repeat(a[-1:], Bp - B_req, axis=0)])
                            for a in arrays]
                self.dispatches += 1
                return np.asarray(self._fn(*arrays))[:B_req]
            for s in range(0, B_req, B):
                chunk = [a[s:s + B] for a in arrays]
                n = chunk[0].shape[0]
                if n < B:
                    chunk = [np.concatenate(
                        [c, np.repeat(c[-1:], B - n, axis=0)]) for c in chunk]
                self.dispatches += 1
                outs.append(np.asarray(self._fn(*chunk))[:n])
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)

    # -- micro-batching ------------------------------------------------------

    def start_microbatch(self, window_ms: float = 5.0) -> None:
        """Coalesce CONCURRENT small requests into shared dispatches.

        Peak device throughput is at the compiled batch (docs/SERVING.md:
        B=8 fills the chip; a B=1 request wastes ~8x and still pays the
        full dispatch round-trip).  With micro-batching on, a request
        smaller than the compiled batch parks for up to ``window_ms``
        while other requests arrive; parked requests are concatenated
        into one padded dispatch and each caller gets exactly its own
        rows back (per-row outputs are batch-independent in eval mode).
        Single-client latency cost is bounded by ``window_ms``."""
        if self._batcher is None:
            self._batcher = _MicroBatcher(self, window_ms)

    def stop_microbatch(self) -> None:
        if self._batcher is not None:
            self._batcher.close()
            self._batcher = None

    def warmup(self) -> None:
        """Compile/execute once on zeros so the first request is fast."""
        zeros = {i["name"]: np.zeros([d or 1 for d in i["shape"]], i["dtype"])
                 for i in self.manifest["inputs"]}
        before = (self.requests, self.items, self.dispatches,
                  self.coalesced, self.total_s)
        self.predict(zeros)
        # compile time isn't traffic: restore the counters
        (self.requests, self.items, self.dispatches, self.coalesced,
         self.total_s) = before

    def stats(self) -> dict:
        return {
            "task": self.manifest["task"],
            "batch_size": self.batch_size,
            "requests": self.requests,
            "items": self.items,
            "dispatches": self.dispatches,
            "coalesced_requests": self.coalesced,
            "microbatch": self._batcher is not None,
            "avg_ms_per_item": (round(self.total_s / self.items * 1e3, 3)
                                if self.items else None),
        }


class _MicroBatcher:
    """Request coalescer for :meth:`ServingEngine.start_microbatch`.

    One collector thread: takes the first parked request, keeps
    gathering until the compiled batch is filled or ``window_ms``
    elapses, concatenates, runs ONE ``engine._dispatch`` and hands each
    caller its own rows.  Errors from the shared dispatch propagate to
    every participating caller."""

    _CLOSE = object()

    def __init__(self, engine: ServingEngine, window_ms: float):
        self._engine = engine
        self._window_s = max(window_ms, 0.0) / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._submit_lock = threading.Lock()
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="sonet-microbatch")
        self._thread.start()

    def submit(self, arrays: list, n: int) -> np.ndarray:
        # the lock orders every enqueue before the CLOSE sentinel: a
        # predict() racing stop_microbatch() either lands in the queue
        # (the collector drains everything up to CLOSE) or dispatches
        # directly — it can never park forever behind the sentinel
        with self._submit_lock:
            if self._closed:
                return self._engine._dispatch(arrays, n)
            slot = {"done": threading.Event()}
            self._q.put((arrays, n, slot))
        slot["done"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["out"]

    def close(self) -> None:
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(self._CLOSE)
        self._thread.join(timeout=10)

    def _loop(self) -> None:
        while True:
            first = self._q.get()
            if first is self._CLOSE:
                return
            group = [first]
            total = first[1]
            # a poly engine has no fixed batch; fill toward its largest
            # bucket, or 8 for a symbolic artifact (the measured
            # throughput optimum, docs/SERVING.md)
            B = self._engine.batch_size
            if B is None:
                bks = self._engine.manifest.get("buckets")
                B = bks[-1] if bks else 8
            deadline = time.perf_counter() + self._window_s
            while total < B:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if nxt is self._CLOSE:
                    self._finish(group, total)
                    return
                group.append(nxt)
                total += nxt[1]
            self._finish(group, total)

    def _finish(self, group: list, total: int) -> None:
        arrays = [np.concatenate([g[0][i] for g in group])
                  for i in range(len(group[0][0]))]
        try:
            out = self._engine._dispatch(arrays, total)
        except Exception as e:  # propagate to every caller
            for _, _, slot in group:
                slot["error"] = e
                slot["done"].set()
            return
        if len(group) > 1:
            with self._engine._stats_lock:
                self._engine.coalesced += len(group)
        ofs = 0
        for _, n, slot in group:
            slot["out"] = out[ofs:ofs + n]
            ofs += n
            slot["done"].set()
