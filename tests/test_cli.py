"""`sonet` console entry point (sonet_tpu/cli.py).

The reference's user surface is four checkout-only train.py scripts;
the installed wheel here reaches every driver through one command.
"""

import subprocess
import sys

import pytest

from sonet_tpu import cli


class TestDispatch:
    def test_help_lists_every_command(self, capsys):
        assert cli.main([]) == 0
        out = capsys.readouterr().out
        for name in cli._COMMANDS:
            assert name in out

    def test_unknown_command(self, capsys):
        assert cli.main(["frobnicate"]) == 2
        assert "unknown command" in capsys.readouterr().err

    def test_routes_argv_to_task_main(self, monkeypatch):
        calls = {}

        def fake_main(argv):
            calls["argv"] = argv
            return {"metric": 1.0}  # payload return, not an exit code

        import sonet_tpu.tasks.classify as classify
        monkeypatch.setattr(classify, "main", fake_main)
        rc = cli.main(["classify", "--preset", "tiny_test"])
        assert rc == 0
        assert calls["argv"] == ["--preset", "tiny_test"]

    def test_segment_alias(self, monkeypatch):
        import sonet_tpu.tasks.partseg as partseg
        monkeypatch.setattr(partseg, "main", lambda argv: 0)
        assert cli.main(["segment"]) == 0

    def test_prep_reachable(self, tmp_path, capsys):
        """`sonet prep check` on a missing tree fails closed (exit 1)
        through the real prep driver, not a stub."""
        with pytest.raises(SystemExit) as ei:
            cli.main(["prep", "check", "--root", str(tmp_path / "nope"),
                      "--layout", "modelnet"])
        assert ei.value.code == 1
        assert "no split lists found" in capsys.readouterr().err


class TestTaskModulesImport:
    def test_all_task_modules_import_and_expose_main(self):
        import importlib

        for name in ("autoencode", "classify", "export", "import_ckpt",
                     "infer", "partseg", "retrieve", "serve"):
            mod = importlib.import_module(f"sonet_tpu.tasks.{name}")
            assert callable(mod.main), name

    def test_checkout_wrappers_still_work(self):
        """Repo-root tasks/*.py keep working for checkout users."""
        import importlib.util
        import os

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "classify_wrapper", os.path.join(repo, "tasks", "classify.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        from sonet_tpu.tasks.classify import main as real_main
        assert mod.main is real_main


def test_console_script_help_is_fast():
    """Help must not pull the heavy stack (flax/optax/orbax, or any
    sonet_tpu compute subpackage).  jax itself may already be in
    sys.modules at interpreter boot on some hosts (site hooks), so the
    check is on what *this* import added."""
    code = ("import sys, sonet_tpu.cli as c; c.main([]); "
            "bad = [m for m in ('flax', 'optax', 'orbax', 'sonet_tpu.ops', "
            "'sonet_tpu.nn', 'sonet_tpu.train') if m in sys.modules]; "
            "assert not bad, f'help imported {bad}'")
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
