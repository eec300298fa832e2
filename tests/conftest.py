"""Test configuration: CPU backend with 8 virtual devices, x64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count), standing in for a TPU slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real TPU
# Hermetic per-run compile cache: stale cross-process entries (e.g. AOT
# CPU executables baked on a host with different CPU features) have hung
# cache READS mid-suite, so tests never share the user-level cache dir —
# but a run-local one stays useful (repeated identical programs across
# test files).
import tempfile as _tempfile

os.environ["PDB2R_TPU_CACHE"] = _tempfile.mkdtemp(prefix="pdb2r_test_cache_")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform before conftest
# runs; override it before any backend is initialized so tests stay on the
# 8-virtual-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------------------
# Two-tier suite: quick (default-green in <5 min on a 1-CPU host with -n 2)
# vs slow (compile-heavy; full suite ~27 min).  Centralised here instead of
# per-test decorators so the tier assignment lives next to the measured
# durations that justify it (every entry was >=13 s on the 1-core driver
# host, /tmp/durations_r4.log).  Invocations:
#     python -m pytest tests/ -m "not slow"     # quick tier, < 5 min
#     python -m pytest tests/                   # everything
# ---------------------------------------------------------------------------

_SLOW_FILES = {
    # every test in these files is compile-heavy (virtual-mesh shard_map /
    # train-step / eSCN-backbone programs)
    "test_spatial.py",
    "test_train.py",
}

_SLOW_TESTS = {
    # test_escn.py — eSCN backbone + Pallas kernel parity sweeps
    "test_edge_kernel_parity_md_shape",
    "test_mega_kernel_multi_fwd_tile",
    "test_mega_kernel_vmap_batch_parity",
    "test_edge_kernel_pallas_parity",
    "test_premerge_exact",
    "test_escn_symmetries",
    "test_escn_through_calculator",
    "test_escn_hessian_routing_with_pallas_kernel",
    # test_escn_parity.py / test_escn_golden.py
    "test_energy_force_parity",
    "test_pt_checkpoint_through_calculator",
    "test_energy_forces_vs_independent_golden",
    # production-dims goldens (r5): lmax=4/C=128 programs, ~2.5 min CPU
    "test_inferred_config_at_production_dims",
    "test_energy_forces_vs_independent_golden_md",
    "test_pallas_mega_on_converted_weights_md",
    # test_pallas_ops.py
    "test_pallas_mode_matches_dense_mode",
    # test_all_pipeline.py / test_cli.py end-to-end drives
    "test_all_pdb_full_output_tree",
    "test_opt_cli_escn_backbone",
    "test_all_pipeline_xyz",
    "test_all_single_pdb_scan_lists_remap",
    "test_cli_full_chain",
    "test_cli_freq_sort_and_irc_knobs",
    # test_dlc.py
    "test_dlc_beats_cartesian_on_21_atoms",
    "test_dlc_frozen_atoms_constrained",
    "test_dlc_through_opt_workflow",
    "test_primitive_construction_counts",
    # test_gsm.py / test_dmf.py
    "test_gsm_growth_fidelity_curved_valley",
    "test_gsm_host_loop_matches_device",
    "test_dmf_path_quality_vs_tight_gsm",
    # test_calculator.py / test_distributed.py
    "test_tensor_parallel_inference_identical",
    "test_two_process_sharded_forces",
    # test_restart.py
    "test_irc_restart_resumes_branch",
    "test_dimer_restart_resumes_pass",
    "test_lbfgs_restart_resumes_from_dump",
    # test_tsopt_irc.py
    "test_irc_hessian_recalc_tracks_curved_valley",
    "test_irc_both_branches_12_atoms",
    # misc >=13 s
    "test_padding_invariance",
    "test_path_search_resume_uses_memo",
    "test_multi_template_merge_and_segment_summaries",
    "test_biased_calculator_shifts_minimum",
    "test_hessian_on_mlip",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.name.split("[")[0]
        if name in _SLOW_TESTS or item.path.name in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
