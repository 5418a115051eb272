#!/usr/bin/env python3
"""Repo-checkout wrapper; the driver lives in sonet_tpu.tasks.reproduce
(also: ``sonet reproduce``)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sonet_tpu.tasks.reproduce import main  # noqa: E402,F401

if __name__ == "__main__":
    raise SystemExit(main())
