"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count=8`` (the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The image's sitecustomize registers the TPU ('axon') backend and overrides
# JAX_PLATFORMS via jax.config — force CPU here so the 8-device virtual mesh
# is available and tests don't contend for the single TPU chip.
jax.config.update("jax_platforms", "cpu")

# Tests verify numerics against NumPy references — use full precision for
# jnp matmuls/einsums (library blocks that intend bf16 cast explicitly).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# fast/slow split: the full suite takes ~14 min on this 2-CPU host (scan/jit
# compiles dominate); the default run (`pytest -q`) excludes the heavy
# compile tests below and finishes in ~6 min. Run EVERYTHING with
# `pytest -m ""` (CI note in README). Centralized here so the split is one
# list, not scattered decorators.
# ---------------------------------------------------------------------------

_SLOW_NODEIDS = (
    # registry-wide learning evidence: 25+ full fits (the meta coverage
    # check stays in the default tier)
    "test_models_learn_all.py::test_interaction_model_learns",
    "test_models_learn_all.py::test_sequence_model_learns",
    "test_models_learn_all.py::test_memory_models_beat_din_on_interest_drift",
    # parallel: a2a exchange deep-coverage (smoke parity kept in default)
    "test_parallel.py::test_a2a_bf16_compress_close_and_grads_flow",
    "test_parallel.py::test_a2a_grads_match",
    "test_parallel.py::test_a2a_lookup_matches_dense",
    "test_parallel.py::test_a2a_capacity_overflow_drops_to_zero",
    "test_parallel.py::test_sharded_training_run_matches_single_device",
    "test_parallel.py::test_sharded_sequence_model_matches_single_device",
    "test_seq_parallel.py::test_seq_parallel_grads",
    "test_pipeline.py::test_pipeline_backward_matches_sequential",
    # heavy scan/attention compiles
    "test_lsh_attention.py::test_bst_and_sim_lsh_option",
    "test_models_sequence.py::test_seq_model_forward_and_grad",
    "test_models_sequence.py::test_deepmcp_learns",
    "test_models_longseq.py::test_mimn_batch_size_independent",
    "test_models_longseq.py::test_longseq_forward_and_grad[mimn",
    "test_models_longseq.py::test_longseq_forward_and_grad[hpmn",
    "test_models_longseq.py::test_longseq_forward_and_grad[sim",
    "test_models_longseq.py::test_sim_reduced_esu_matches_full",
    # multitask deep-coverage (mmoe_learns + esmm stay in default)
    "test_models_multitask.py::test_ple_private_experts_untouched_by_other_task",
    "test_models_multitask.py::test_ple_learns_and_isolates_gradients",
    "test_models_multitask.py::test_forward_and_grad[ple",
    "test_models_multitask.py::test_forward_and_grad[mmoe",
    # cold-start meta-objective (mechanics tests stay in default)
    "test_models_coldstart.py::test_meta_training_reduces_meta_loss",
    "test_models_coldstart.py::test_override_changes_forward_and_grads_flow",
    # r3 additions: deep-coverage variants (each path keeps a default-tier
    # smoke: the 2-process train drill, sharded-sparse adagrad equality,
    # DICM forward/grad, CLI sparse run)
    "test_multiprocess.py::test_two_process_cli_train_checkpoint_resume",
    "test_multiprocess.py::test_two_process_seq_sharded_sim",
    "test_multiprocess.py::test_two_process_sparse_row_path",
    "test_multiprocess.py::test_kill_a_worker_elastic_recovery",
    "test_models_image.py::test_dicm_learns_visual_signal",
    "test_parallel_sparse.py::test_sharded_sparse_matches_single_device[adam-a2a]",
    "test_parallel_sparse.py::test_sharded_sparse_matches_single_device[adagrad-allgather]",
    "test_parallel_sparse.py::test_sharded_sparse_with_bf16_compress",
    "test_sparse_optimizer.py::test_sparse_rowwise_adagrad_single_accumulator_learns",
    "test_sparse_optimizer.py::test_sparse_step_supports_sequence_models",
    "test_cli.py::test_cli_checkpoint_rejects_layout_mismatch",
    "test_models_sequence.py::test_dssm_towers_and_retrieval",
    # interaction fwd/grad matrix: heavy graphs (goldens + learns + the
    # cheap half of the matrix stay in default)
    "test_models_interaction.py::test_model_forward_and_grad[fignn]",
    "test_models_interaction.py::test_model_forward_and_grad[fgcnn]",
    "test_models_interaction.py::test_model_forward_and_grad[autoint]",
    "test_models_interaction.py::test_model_forward_and_grad[xdeepfm]",
    "test_models_interaction.py::test_model_forward_and_grad[fat_deepffm]",
    "test_models_interaction.py::test_model_forward_and_grad[fibinet]",
    "test_models_interaction.py::test_model_forward_and_grad[afm]",
    "test_models_interaction.py::test_model_forward_and_grad[pnn]",
    "test_models_interaction.py::test_model_forward_and_grad[deepcross]",
    "test_models_interaction.py::test_model_forward_and_grad[fnn]",
    "test_models_interaction.py::test_model_forward_and_grad[ccpm]",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(pat in item.nodeid for pat in _SLOW_NODEIDS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
