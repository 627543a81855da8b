#!/usr/bin/env python
"""Top-level shim mirroring the reference's `test_disp.py` CLI."""
from supervised_dispnet_tpu.cli.test_disp import main

if __name__ == "__main__":
    main()
