"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware.

Note: this environment pre-sets JAX_PLATFORMS=axon (TPU tunnel) and its
site hooks re-assert it, so the env-var route is not reliable —
``jax.config.update`` after import (before backend init) is.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite is compile-bound (~20 min cold);
# warm re-runs skip most of it
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


# ---------------------------------------------------------------------------
# `standard` tier (VERDICT r4 item 6): the highest-value ~80 tests — every
# parity / golden-value module plus one-per-feature train-step coverage —
# selected so `pytest -m "quick or standard"` verifies majority coverage in
# one sub-10-min window. Applied by module here (instead of ~80 inline
# decorators) with a denylist for tests whose full-model backward compiles
# dominate runtime; those stay full-tier only.
_STANDARD_MODULES = {
    "test_losses",              # loss golden values + torch-semantics parity
    "test_warp",                # geometry (pixel2cam/cam2pixel/inverse_warp)
    "test_sampling",            # grid_sample parity incl. padding modes
    "test_fused_upconv",        # fused decoder op parity + grads
    "test_fused_deconv",        # pixel-shuffle ConvTranspose parity + grads
    "test_spatial",             # height-sharded conv parity on virtual mesh
    "test_checkpoint_convert",  # torch<->flax conversion parity
    "test_kitti_eval",          # Eigen protocol golden values (crop/caps)
    "test_quant",               # int8 PTQ/QAT/chain parity
    "test_augment",             # aug semantics + intrinsics rescale
    "test_accum",               # gradient accumulation parity
    "test_serving",             # online micro-batching parity (round 5)
}
_STANDARD_SLOW_DENYLIST = {
    # full-model backward compiles measured >=40 s each (see f6171e2)
    "test_photometric_batched_refs_loss_and_grads_equal",
    "test_photometric_remat_loss_and_grads_equal",
    "test_dispresnet_fused_upsample_grad_parity",
    # round 5: two full fused-model compiles + classification variant —
    # the core chain parity test (test_decoder_chain_parity_dispresnet)
    # carries the standard-tier coverage
    "test_decoder_chain_multiscale_heads_and_classification",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if (item.module.__name__.rpartition(".")[2] in _STANDARD_MODULES
                and item.originalname not in _STANDARD_SLOW_DENYLIST
                and not item.get_closest_marker("quick")):
            item.add_marker(pytest.mark.standard)
