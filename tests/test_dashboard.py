"""Live training dashboard (sonet_tpu/utils/dashboard.py, `sonet monitor`).

The reference's live-observability surface is a visdom server the user
must keep running (README.md:56-62, util/visualizer.py:63-76); here the
daemon replays + tail-follows the run's JSONL metrics.
"""

import json
import os
import urllib.error
import urllib.request

import pytest

from sonet_tpu.utils.dashboard import (list_runs, make_dashboard_server,
                                       read_metrics)


def _write_rows(run_dir, rows, name="train"):
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, f"{name}_metrics.jsonl"), "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _get(srv, path):
    port = srv.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                    timeout=10) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


class TestReadMetrics:
    def test_incremental_cursor(self, tmp_path):
        run = str(tmp_path / "r")
        _write_rows(run, [{"step": 1, "train_loss": 2.0}])
        rows, cur = read_metrics(run)
        assert [r["step"] for r in rows] == [1]
        # nothing new: same cursor, no rows
        rows2, cur2 = read_metrics(run, since=cur)
        assert rows2 == [] and cur2 == cur
        # trainer appends while we poll
        _write_rows(run, [{"step": 2, "train_loss": 1.0},
                          {"step": 3, "train_loss": 0.5}])
        rows3, cur3 = read_metrics(run, since=cur)
        assert [r["step"] for r in rows3] == [2, 3] and cur3 > cur

    def test_partial_trailing_line_not_consumed(self, tmp_path):
        run = str(tmp_path / "r")
        _write_rows(run, [{"step": 1, "train_loss": 2.0}])
        path = os.path.join(run, "train_metrics.jsonl")
        with open(path, "a") as f:
            f.write('{"step": 2, "train_lo')  # mid-write, no newline
        rows, cur = read_metrics(run)
        assert len(rows) == 1
        with open(path, "a") as f:
            f.write('ss": 1.0}\n')  # write completes
        rows2, _ = read_metrics(run, since=cur)
        assert rows2 == [{"step": 2, "train_loss": 1.0}]

    def test_malformed_complete_line_skipped(self, tmp_path):
        run = str(tmp_path / "r")
        path = os.path.join(run, "train_metrics.jsonl")
        os.makedirs(run)
        with open(path, "w") as f:
            f.write("not json\n")
            f.write('{"step": 1, "train_loss": 2.0}\n')
        rows, cur = read_metrics(run)
        assert len(rows) == 1 and cur == os.path.getsize(path)

    def test_missing_file(self, tmp_path):
        assert read_metrics(str(tmp_path)) == ([], 0)


class TestServer:
    @pytest.fixture
    def root(self, tmp_path):
        _write_rows(str(tmp_path / "runA"),
                    [{"step": 1, "epoch": 0, "train_loss": 2.0},
                     {"step": 2, "epoch": 0, "train_loss": 1.5}])
        _write_rows(str(tmp_path / "runB"),
                    [{"step": 1, "test_acc": 0.5}])
        (tmp_path / "runA" / "config.json").write_text("{}")
        return str(tmp_path)

    def test_endpoints(self, root):
        srv = make_dashboard_server(root, port=0)
        try:
            status, body = _get(srv, "/api/runs")
            runs = json.loads(body)["runs"]
            assert {r["name"] for r in runs} == {"runA", "runB"}
            assert [r for r in runs if r["name"] == "runA"][0]["has_config"]

            status, body = _get(srv, "/api/metrics?run=runA&since=0")
            j = json.loads(body)
            assert [r["step"] for r in j["rows"]] == [1, 2]
            assert j["next"] > 0

            # incremental: follow-up poll from the cursor is empty
            status, body = _get(srv, f"/api/metrics?run=runA&since={j['next']}")
            assert json.loads(body)["rows"] == []

            status, body = _get(srv, "/run?name=runA")
            assert status == 200 and b"sonet monitor" in body

            status, body = _get(srv, "/")
            assert b"runA" in body and b"runB" in body
        finally:
            srv.shutdown()

    def test_path_escape_rejected(self, root):
        srv = make_dashboard_server(root, port=0)
        try:
            status, body = _get(srv, "/api/metrics?run=..%2F..%2Fetc&since=0")
            assert json.loads(body).get("error") == "unknown run"
        finally:
            srv.shutdown()

    def test_single_run_root_redirects(self, tmp_path):
        run = str(tmp_path / "only")
        _write_rows(run, [{"step": 1, "train_loss": 1.0}])
        srv = make_dashboard_server(run, port=0)
        try:
            # the run dir itself is the root: "." is the single run
            status, body = _get(srv, "/")  # urllib follows the 302
            assert b"sonet monitor" in body
            status, body = _get(srv, "/api/metrics?run=.&since=0")
            assert json.loads(body)["rows"][0]["train_loss"] == 1.0
        finally:
            srv.shutdown()


class TestMonitorCLI:
    def test_flags_and_dispatch(self, monkeypatch, tmp_path, capsys):
        """`sonet monitor --run <dir>` builds the server on that dir."""
        from sonet_tpu.tasks import monitor

        captured = {}
        real = make_dashboard_server

        def wrapper(root, **kw):
            captured["root"] = root
            srv = real(root, **kw)
            srv._thread = type("T", (), {"join": lambda self: None})()
            return srv

        monkeypatch.setattr(monitor, "make_dashboard_server", wrapper)
        run = str(tmp_path / "r")
        _write_rows(run, [{"step": 1, "train_loss": 1.0}])
        assert monitor.main(["--run", run, "--port", "0"]) == 0
        assert captured["root"] == run
        assert "sonet monitor on http://" in capsys.readouterr().out
