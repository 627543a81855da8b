#!/usr/bin/env python
"""Top-level shim mirroring the reference's `train.py` CLI."""
from supervised_dispnet_tpu.cli.train import main

if __name__ == "__main__":
    main()
