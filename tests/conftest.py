"""Test config: force an 8-device virtual CPU mesh (the JAX idiom for fake
multi-chip, SURVEY.md §4d) so sharding paths are exercised without TPUs."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon sitecustomize force-registers the TPU tunnel backend and sets
# jax_platforms="axon,cpu"; override before any backend initializes so the
# suite runs on the fast local CPU with 8 virtual devices
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synth_root(tmp_path_factory):
    from imm_tsf_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("data") / "EPA-Air"
    make_synthetic_dataset(str(root), n_entities=4, n_features=3, n_days=120, seed=0)
    return str(root.parent)


@pytest.fixture(scope="session")
def ragged_fusion_batch():
    """The canonical 3-sample ragged fixture incl. an empty-notes sample
    (modeled on the reference fusion __main__ smoke tests,
    fusions/TTF_RecAvg.py:116-173)."""
    rng = np.random.default_rng(0)
    B, N, d_txt, T_f = 3, 4, 8, 5
    notes = rng.standard_normal((B, N, d_txt)).astype(np.float32)
    notes_mask = np.ones((B, N), np.float32)
    notes_mask[0, 2:] = 0.0  # sample 0: 2 notes
    notes_mask[2, :] = 0.0  # sample 2: empty notes
    notes = notes * notes_mask[:, :, None]
    tau = np.sort(rng.uniform(0, 5, (B, N)).astype(np.float32), axis=1) * notes_mask
    t_hat = np.tile(np.linspace(5.0, 7.0, T_f, dtype=np.float32), (B, 1))
    return dict(notes=notes, notes_mask=notes_mask, tau=tau, t_hat=t_hat)
