"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding/collective code paths are exercised without TPU hardware.

Note: the session's sitecustomize registers a remote-TPU ('axon') PJRT
plugin and hard-sets ``jax_platforms='axon,cpu'`` via jax.config —
env vars alone cannot override it, so we update the config after import.
Running tests over the TPU tunnel would cost ~1s per eager op.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# ---------------------------------------------------------------------
# Test tiers (see TESTING.md):
#   pytest -m fast        < 2 min commit gate (curated, representative)
#   pytest -m "not slow"  medium tier (~5 min)
#   pytest                full suite (~25-30 CPU-minutes)
#   GOTENNET_TPU_TESTS=1  additionally runs the hw-marked compiled-
#                         kernel validations (needs a real TPU)
# ---------------------------------------------------------------------

# Curated fast tier: unit modules that are cheap end to end, plus one
# representative of each expensive family (oracle parity on the
# flagship config, one Pallas gradcheck, one trainer overfit run).
_FAST_MODULES = {
    "test_ops.py", "test_spherical.py", "test_segment.py",
    "test_data.py", "test_sweep.py", "test_native.py",
}
_FAST_TESTS = {
    ("test_torch_parity.py",
     "test_jax_matches_torch_oracle"
     "[eu=True_ln=_aggr=add_rbf=expnorm_sh=True_sd=True]"),
    ("test_fused_gata.py", "test_fused_backward_matches_autodiff[sep1-8-2-4]"),
    ("test_train.py", "test_overfit_tiny"),
    ("test_train.py", "test_checkpoint_roundtrip"),
    ("test_train.py", "test_plateau_and_warmup"),
    ("test_train.py", "test_alias_validation"),
    ("test_train.py", "test_make_splits_roundtrip"),
    ("test_config_cli.py", "test_config_composition_and_overrides"),
    ("test_model.py", "test_equivariance_full_model"),
}

# Anything that took >= ~10 CPU-seconds in the tracked full-suite run
# (pytest --durations): kept out of the medium tier.
_SLOW_TESTS = {
    ("test_distributed.py", "test_two_process_matches_single_process"),
    ("test_dense.py", "test_dense_forces_match_edge_layout"),
    ("test_dense.py", "test_fused_dense_matches_unfused"),
    ("test_dense.py", "test_fused_attention_dropout"),
    ("test_dense.py", "test_dense_padding_invariance"),
    ("test_dense.py", "test_dense_neighbor_cap_matches_edge_list"),
    ("test_dense.py", "test_dense_matches_edge_list"),
    ("test_dense.py", "test_trainer_accum_with_bucketed_loader"),
    ("test_dense.py", "test_dense_with_dropout_trains"),
    ("test_ell.py", None),                 # whole module is heavy
    ("test_trainer_parallel.py", None),
    ("test_parallel.py", "test_parallel_train_step_matches_serial"),
    ("test_config_cli.py", "test_cli_smoke_train"),
    ("test_config_cli.py", "test_cli_smoke_dense_layout"),
    ("test_config_cli.py", "test_cli_smoke_force_training"),
    ("test_heads.py", "test_force_equivariance"),
    ("test_heads.py", "test_forces_match_finite_differences"),
    ("test_heads.py", "test_atomwise_atomref_and_standardization"),
    ("test_train.py", "test_grad_accumulation_matches_big_batch"),
    ("test_train.py", "test_full_state_resume_matches_uninterrupted"),
    ("test_train.py", "test_overfit_tiny"),
    ("test_train.py", "test_resume_from_last_checkpoint"),
    ("test_train.py", "test_force_training_step"),
    ("test_fused_gata.py", "test_fused_backward_matches_autodiff"),
    ("test_fused_ell.py", "test_fused_ell_backward_matches_autodiff"),
    ("test_fused_ell.py", "test_fused_ell_row_shard_slice"),
    ("test_fused_htr.py", "test_fused_htr_matches_oracle"),
    ("test_molecule3d_cli.py", "test_molecule3d_cli_train"),
    ("test_training_parity.py", "test_training_parity_vs_torch"),
    ("test_training_parity.py", "test_use_ema_in_loss_parity_vs_torch"),
    ("test_torch_parity.py", "test_fused_kernels_match_torch_oracle"),
}


def _base_name(item):
    """Test name without the parametrization suffix."""
    return item.name.split("[", 1)[0]


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if (fname in _FAST_MODULES
                or (fname, item.name) in _FAST_TESTS
                or (fname, _base_name(item)) in _FAST_TESTS):
            item.add_marker(pytest.mark.fast)
        if ((fname, None) in _SLOW_TESTS
                or (fname, item.name) in _SLOW_TESTS
                or (fname, _base_name(item)) in _SLOW_TESTS):
            item.add_marker(pytest.mark.slow)
