#!/usr/bin/env python3
"""Live training dashboard daemon (the reference's `python -m
visdom.server` + Visualizer role, README.md:56-62 — here it reads the
run dirs' JSONL metrics, so it can start/stop any time without losing
history).

    sonet monitor --root checkpoints/ --port 8322
    sonet monitor --run checkpoints/modelnet40        # single run
"""

import argparse
import os

# stdlib-only import path: utils.__init__ is lazy (PEP 562), so this
# pulls in neither jax nor matplotlib — the daemon runs on any machine
# that sees the run dir (ADVICE r2)
from sonet_tpu.utils.dashboard import make_dashboard_server


def main(argv=None):
    p = argparse.ArgumentParser(
        description="live SVG charts over run-dir JSONL metrics")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--root", help="directory containing run dirs")
    g.add_argument("--run", help="one run dir")
    p.add_argument("--port", type=int, default=8322)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (0.0.0.0 to expose)")
    p.add_argument("--refresh_ms", type=int, default=3000)
    args = p.parse_args(argv)

    root = args.root or args.run
    if not os.path.isdir(root):
        raise SystemExit(f"sonet monitor: {root!r} is not a directory")
    srv = make_dashboard_server(root, port=args.port,
                                refresh_ms=args.refresh_ms, host=args.host)
    host, port = srv.server_address[:2]
    print(f"sonet monitor on http://{host}:{port}/  (ctrl-c to stop)",
          flush=True)
    try:
        srv._thread.join()
    except KeyboardInterrupt:
        srv.shutdown()
    return 0


if __name__ == "__main__":
    main()
