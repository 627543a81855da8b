#!/usr/bin/env python
"""Top-level shim mirroring the reference's `test_pose.py` CLI."""
from supervised_dispnet_tpu.cli.test_pose import main

if __name__ == "__main__":
    main()
