#!/usr/bin/env python
"""Top-level shim mirroring the reference's `run_inference.py` CLI."""
from supervised_dispnet_tpu.cli.run_inference import main

if __name__ == "__main__":
    main()
