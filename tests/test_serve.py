"""ServingEngine + HTTP daemon (sonet_tpu/serving.py + tasks/serve.py).

Pins the request-level serving semantics: arbitrary request batch sizes
chunk/pad onto the fixed compiled batch with per-row outputs identical
to an exact-batch call, the HTTP surface speaks JSON and npz, and bad
inputs are rejected before dispatch.  Beyond-reference capability (the
reference has no serving surface, shrec16/test.py:31-32)."""

import io
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from sonet_tpu.config import tiny_test
from sonet_tpu.serving import ServingEngine, export_run
from sonet_tpu.train.trainer import Trainer


def _load_serve_task():
    from sonet_tpu.tasks import serve
    return serve


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    cfg = tiny_test().replace(
        checkpoints_dir=str(tmp_path_factory.mktemp("serve_run")),
        epochs=1, checkpoint_every=1, name="serve_cls")
    trainer = Trainer(cfg, quiet=True, resume=False)
    trainer.fit()
    return trainer.out_dir


@pytest.fixture(scope="module")
def engine(run_dir):
    eng = ServingEngine.from_run(run_dir)
    eng.warmup()
    return eng


def _inputs(engine, B, seed=0):
    rng = np.random.RandomState(seed)
    return {i["name"]: rng.randn(B, *i["shape"][1:]).astype(i["dtype"])
            for i in engine.manifest["inputs"]}


@pytest.mark.slow
class TestServingEngine:
    def test_exact_batch_and_stats(self, engine):
        B = engine.batch_size
        out = engine.predict(_inputs(engine, B))
        assert out.shape == (B, engine.manifest["classes"])
        assert np.isfinite(out).all()
        s = engine.stats()
        assert s["requests"] >= 1 and s["items"] >= B
        assert s["avg_ms_per_item"] is not None

    def test_partial_batch_pads_and_slices(self, engine):
        B = engine.batch_size
        full = _inputs(engine, B)
        want = engine.predict(full)
        for Bp in (1, B - 1):
            got = engine.predict({k: v[:Bp] for k, v in full.items()})
            assert got.shape[0] == Bp
            np.testing.assert_allclose(got, want[:Bp], rtol=1e-5, atol=1e-5)

    def test_oversized_batch_chunks(self, engine):
        B = engine.batch_size
        big = _inputs(engine, 2 * B + 1, seed=3)
        got = engine.predict(big)
        assert got.shape[0] == 2 * B + 1
        # row i must equal the exact-batch evaluation of its own chunk
        want0 = engine.predict({k: v[:B] for k, v in big.items()})
        np.testing.assert_allclose(got[:B], want0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            got[2 * B:],
            engine.predict({k: v[2 * B:] for k, v in big.items()}),
            rtol=1e-5, atol=1e-5)

    def test_bad_inputs_rejected(self, engine):
        B = engine.batch_size
        good = _inputs(engine, B)
        with pytest.raises(ValueError, match="missing inputs"):
            engine.predict({"pc": good["pc"]})
        with pytest.raises(ValueError, match="expected shape"):
            engine.predict({**good, "pc": good["pc"][:, :-1]})
        with pytest.raises(ValueError, match="inconsistent batch"):
            engine.predict({**good, "sn": good["sn"][:B - 1]})
        with pytest.raises(ValueError, match="empty request"):
            engine.predict({k: v[:0] for k, v in good.items()})

    def test_mesh_engine_matches_single(self, run_dir, engine):
        """A 1-chip-trained run served over a 4x2 mesh: per-row outputs
        identical to single-device serving (state replicated, request
        batch sharded over data x points)."""
        eng8 = ServingEngine.from_run(run_dir, mesh_shape=(4, 2))
        assert eng8.manifest["mesh_shape"] == [4, 2]
        assert eng8.manifest["pooling"] == "scatter"  # 'auto' on CPU
        B = engine.batch_size
        x = _inputs(engine, B + 2, seed=31)   # chunk + pad through the mesh
        np.testing.assert_allclose(eng8.predict(x), engine.predict(x),
                                   rtol=1e-5, atol=1e-5)
        with pytest.raises(ValueError, match="divide"):
            ServingEngine.from_run(run_dir, mesh_shape=(3,))

    def test_mesh_engine_keeps_pinned_fast_pooling(self, run_dir, engine):
        """A run whose config PINS pooling='sorted_window' serves on a
        mesh WITH the fast kernel (shard_map per shard + cross-shard
        pmax, VERDICT r2 #1 — the old behavior downgraded to scatter)
        and matches single-device serving."""
        cfg_path = os.path.join(run_dir, "config.json")
        with open(cfg_path) as f:
            saved = f.read()
        cfg = json.loads(saved)
        cfg["pooling"] = "sorted_window"
        try:
            with open(cfg_path, "w") as f:
                json.dump(cfg, f)
            eng = ServingEngine.from_run(run_dir, mesh_shape=(2,))
            assert eng.manifest["pooling"] == "sorted_window"
            B = eng.batch_size
            x = _inputs(eng, B, seed=5)
            np.testing.assert_allclose(eng.predict(x), engine.predict(x),
                                       rtol=1e-5, atol=1e-5)
        finally:
            with open(cfg_path, "w") as f:
                f.write(saved)

    def test_microbatch_coalesces_and_matches(self, run_dir, engine):
        """Concurrent B=1 requests share a dispatch; every caller gets
        exactly its own rows, identical to un-batched serving."""
        eng = ServingEngine.from_run(run_dir)
        eng.warmup()
        B = eng.batch_size
        full = _inputs(eng, B, seed=41)
        want = engine.predict(full)
        eng.start_microbatch(window_ms=200.0)  # generous: threads line up
        try:
            results = [None] * B
            def one(i):
                results[i] = eng.predict(
                    {k: v[i:i + 1] for k, v in full.items()})
            threads = [threading.Thread(target=one, args=(i,))
                       for i in range(B)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            for i in range(B):
                assert results[i] is not None, i
                np.testing.assert_allclose(results[i], want[i:i + 1],
                                           rtol=1e-5, atol=1e-5)
            s = eng.stats()
            assert s["requests"] == B and s["items"] == B
            assert s["microbatch"]
            # at least some requests shared a dispatch (the 200 ms
            # window is >> thread startup skew)
            assert s["dispatches"] < B
            assert s["coalesced_requests"] >= 2
        finally:
            eng.stop_microbatch()
        # after stop, requests dispatch directly again
        out = eng.predict({k: v[:1] for k, v in full.items()})
        np.testing.assert_allclose(out, want[:1], rtol=1e-5, atol=1e-5)

    def test_microbatch_single_request_window(self, run_dir, engine):
        """A lone small request is not lost: it dispatches after the
        window with correct rows, and full-batch requests bypass the
        batcher entirely."""
        eng = ServingEngine.from_run(run_dir)
        eng.warmup()
        B = eng.batch_size
        full = _inputs(eng, B, seed=43)
        want = engine.predict(full)
        eng.start_microbatch(window_ms=1.0)
        try:
            out = eng.predict({k: v[:2] for k, v in full.items()})
            np.testing.assert_allclose(out, want[:2], rtol=1e-5, atol=1e-5)
            d_before = eng.stats()["dispatches"]
            out = eng.predict(full)  # B_req == B: direct path
            np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
            assert eng.stats()["dispatches"] == d_before + 1
        finally:
            eng.stop_microbatch()

    def test_artifact_engine_matches_run_engine(self, run_dir, engine):
        export_run(run_dir, platforms=["cpu"])
        art = ServingEngine.from_artifact(os.path.join(run_dir, "export"))
        B = engine.batch_size
        x = _inputs(engine, B + 1, seed=7)   # exercises the pad path too
        np.testing.assert_allclose(art.predict(x), engine.predict(x),
                                   rtol=1e-5, atol=1e-5)


class TestHTTPServer:
    @pytest.fixture(scope="class")
    def server(self, engine):
        serve_task = _load_serve_task()
        srv = serve_task.make_server(engine, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{srv.server_address[1]}"
        srv.shutdown()
        srv.server_close()

    def _post(self, url, body, content_type="application/json"):
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": content_type})
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.read(), r.headers.get("Content-Type")

    def test_healthz_and_manifest(self, server, engine):
        with urllib.request.urlopen(server + "/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["task"] == "classify"
        with urllib.request.urlopen(server + "/v1/manifest", timeout=30) as r:
            man = json.loads(r.read())
        assert man == engine.manifest

    def test_predict_json(self, server, engine):
        x = _inputs(engine, 2, seed=11)
        body = json.dumps({k: v.tolist() for k, v in x.items()}).encode()
        status, raw, _ = self._post(server + "/v1/predict", body)
        assert status == 200
        resp = json.loads(raw)
        assert resp["items"] == 2
        want = engine.predict(x)
        np.testing.assert_allclose(np.array(resp["output"]), want,
                                   rtol=1e-5, atol=1e-5)
        assert resp["shape"] == list(want.shape)

    def test_predict_npz_roundtrip(self, server, engine):
        x = _inputs(engine, 3, seed=12)
        buf = io.BytesIO()
        np.savez(buf, **x)
        status, raw, ctype = self._post(
            server + "/v1/predict?format=npz", buf.getvalue(),
            content_type="application/x-npz")
        assert status == 200 and ctype == "application/x-npz"
        with np.load(io.BytesIO(raw)) as z:
            got = z["output"]
        np.testing.assert_allclose(got, engine.predict(x),
                                   rtol=1e-5, atol=1e-5)

    def test_concurrent_requests(self, server, engine):
        """Parallel clients: dispatch is serialized by the engine lock,
        every response carries its own rows (no cross-request mixing)."""
        def one(seed, results):
            x = _inputs(engine, 2, seed=seed)
            body = json.dumps({k: v.tolist() for k, v in x.items()}).encode()
            status, raw, _ = self._post(server + "/v1/predict", body)
            results[seed] = (status, np.array(json.loads(raw)["output"]),
                             engine.predict(x))

        results = {}
        threads = [threading.Thread(target=one, args=(s, results))
                   for s in (21, 22, 23, 24)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert len(results) == 4
        for status, got, want in results.values():
            assert status == 200
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_oversized_body_rejected(self, engine):
        """Bodies over the size cap get a 413 without being read."""
        serve_task = _load_serve_task()
        srv = serve_task.make_server(engine, port=0, max_request_mb=0.001)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            url = f"http://127.0.0.1:{srv.server_address[1]}/v1/predict"
            with pytest.raises(urllib.error.HTTPError) as ei:
                self._post(url, b"x" * 4096)
            assert ei.value.code == 413
            assert "exceeds" in json.loads(ei.value.read())["error"]
        finally:
            srv.shutdown()
            srv.server_close()

    def test_drain_completes_inflight_and_refuses_new(self):
        """SIGTERM-equivalent drain (VERDICT r2 #4): the in-flight
        request completes with 200 while healthz flips to 503 and new
        predicts are refused; afterwards the listener is closed."""
        serve_task = _load_serve_task()

        release = threading.Event()
        entered = threading.Event()

        class SlowStub:
            manifest = {"task": "classify", "inputs": [
                {"name": "x", "shape": [1, 2], "dtype": "float32"}]}
            stopped_microbatch = False

            def predict(self, inputs):
                entered.set()
                assert release.wait(timeout=60)
                return np.asarray(inputs["x"], np.float32) + 1.0

            def stats(self):
                return {"task": "classify"}

            def stop_microbatch(self):
                self.stopped_microbatch = True

        stub = SlowStub()
        srv = serve_task.make_server(stub, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        body = json.dumps({"x": [[1.0, 2.0]]}).encode()

        inflight = {}

        def slow_request():
            try:
                inflight["status"], raw, _ = self._post(
                    url + "/v1/predict", body)
                inflight["out"] = json.loads(raw)["output"]
            except Exception as e:  # pragma: no cover - failure detail
                inflight["error"] = e

        t = threading.Thread(target=slow_request)
        t.start()
        assert entered.wait(timeout=30)  # request is now in flight

        drain_result = {}
        d = threading.Thread(target=lambda: drain_result.update(
            clean=serve_task.drain_server(srv, stub, timeout_s=60)))
        d.start()
        assert srv.draining.wait(timeout=30)

        # while draining: not-ready healthz, new predicts refused
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url + "/healthz", timeout=30)
        assert ei.value.code == 503
        assert json.loads(ei.value.read())["status"] == "draining"
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(url + "/v1/predict", body)
        assert ei.value.code == 503
        assert ei.value.headers.get("Retry-After") is not None

        # in-flight request completes normally
        release.set()
        t.join(timeout=60)
        d.join(timeout=60)
        assert inflight.get("status") == 200, inflight
        assert inflight["out"] == [[2.0, 3.0]]
        assert drain_result["clean"] is True
        assert stub.stopped_microbatch
        # listener is closed: connections now fail outright
        with pytest.raises((urllib.error.URLError, ConnectionError, OSError)):
            urllib.request.urlopen(url + "/healthz", timeout=5)

    def test_drain_idempotent_and_timeout(self):
        """drain_server returns False when in-flight work exceeds the
        timeout, and a second call is a no-op returning True."""
        serve_task = _load_serve_task()
        release = threading.Event()
        entered = threading.Event()

        class Stub:
            manifest = {"task": "classify", "inputs": [
                {"name": "x", "shape": [1, 2], "dtype": "float32"}]}

            def predict(self, inputs):
                entered.set()
                release.wait(timeout=60)
                return np.asarray(inputs["x"], np.float32)

            def stats(self):
                return {}

        stub = Stub()
        srv = serve_task.make_server(stub, port=0)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        body = json.dumps({"x": [[0.0, 0.0]]}).encode()
        t = threading.Thread(target=lambda: self._post(
            url + "/v1/predict", body))
        t.start()
        assert entered.wait(timeout=30)
        assert serve_task.drain_server(srv, stub, timeout_s=0.2) is False
        assert serve_task.drain_server(srv, stub, timeout_s=0.2) is True
        release.set()
        t.join(timeout=60)

    def test_errors(self, server, engine):
        # wrong input names -> 400 with the engine's message
        bad = json.dumps({"bogus": [[0.0]]}).encode()
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(server + "/v1/predict", bad)
        assert ei.value.code == 400
        assert "missing inputs" in json.loads(ei.value.read())["error"]
        # malformed JSON -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(server + "/v1/predict", b"{not json")
        assert ei.value.code == 400
        # non-object JSON -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(server + "/v1/predict", b"[1,2]")
        assert ei.value.code == 400
        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            self._post(server + "/v1/nope", b"{}")
        assert ei.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(server + "/nope", timeout=30)
        assert ei.value.code == 404
