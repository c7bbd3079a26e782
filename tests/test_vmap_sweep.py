"""Stacked-seed vmapped training (training/vmap_sweep.py): each replica
must reproduce its serial `trainable(seed=s_i, data_seed=base)` run —
same best_iter, same metrics, same loss trajectory."""

import numpy as np
import pytest

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.training.trainer import trainable
from imm_tsf_tpu.training.vmap_sweep import train_seed_sweep


def _base(synth_root, **over):
    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 batch_size=8, epoch=3, patience=3, seed=1,
                 device_loop=False, host_prefetch=0)
    return cfg.replace(**over)


def test_vmap_sweep_matches_serial(synth_root):
    cfg = _base(synth_root)
    stacked = train_seed_sweep(cfg, seeds=[1, 2, 3])
    assert len(stacked) == 3
    for r in stacked:
        serial = trainable(cfg.replace(seed=r["seed"], data_seed=1,
                                       rng_impl="threefry2x32"))
        assert r["best_iter"] == serial["best_iter"], r["seed"]
        for k in ("mse", "mae", "rmse"):
            np.testing.assert_allclose(r[k], serial[k], rtol=2e-4,
                                       err_msg=f"seed {r['seed']} {k}")
        la = [h["train_loss"] for h in r["history"]]
        lb = [h["train_loss"] for h in serial["history"][: len(la)]]
        np.testing.assert_allclose(la, lb, rtol=2e-4)


def test_vmap_sweep_matches_serial_with_dropout(synth_root):
    """A dropout-bearing model exercises the per-replica rng chain — the
    case where the rbg/vmap instability would break serial equality (the
    sweep pins threefry, which is vmap-invariant)."""
    cfg = _base(synth_root, model="PatchTST", epoch=2, patience=2,
                d_model=32, d_ff=64, n_heads=2, e_layers=1, dropout=0.1)
    stacked = train_seed_sweep(cfg, seeds=[1, 2])
    for r in stacked:
        serial = trainable(cfg.replace(seed=r["seed"], data_seed=1,
                                       rng_impl="threefry2x32"))
        assert r["best_iter"] == serial["best_iter"], r["seed"]
        for k in ("mse", "mae"):
            np.testing.assert_allclose(r[k], serial[k], rtol=2e-4,
                                       err_msg=f"seed {r['seed']} {k}")


def test_vmap_sweep_seeds_differ(synth_root):
    """Replicas are genuinely independent experiments (different inits)."""
    cfg = _base(synth_root, epoch=1, patience=1)
    out = train_seed_sweep(cfg, seeds=[1, 2])
    l1 = out[0]["history"][0]["train_loss"]
    l2 = out[1]["history"][0]["train_loss"]
    assert l1 != l2


def test_vmap_sweep_with_fusion(synth_root):
    cfg = _base(synth_root, epoch=2, patience=2, enable_text=True,
                use_text_embeddings=True, TTF_module="TTF_RecAvg",
                MMF_module="MMF_GR_Add")
    out = train_seed_sweep(cfg, seeds=[1, 2])
    for r in out:
        assert np.isfinite(r["mse"]) and r["mse"] > 0


def test_vmap_sweep_resident_matches_serial(synth_root):
    """Stacked device-RESIDENT mode (one scan dispatch per S-replica
    epoch) must also reproduce the serial resident trainable() runs."""
    cfg = _base(synth_root, device_loop=True)
    stacked = train_seed_sweep(cfg, seeds=[1, 2])
    for r in stacked:
        serial = trainable(cfg.replace(seed=r["seed"], data_seed=1,
                                       rng_impl="threefry2x32"))
        assert r["best_iter"] == serial["best_iter"], r["seed"]
        for k in ("mse", "mae", "rmse"):
            np.testing.assert_allclose(r[k], serial[k], rtol=2e-4,
                                       err_msg=f"seed {r['seed']} {k}")
        la = [h["train_loss"] for h in r["history"]]
        lb = [h["train_loss"] for h in serial["history"][: len(la)]]
        np.testing.assert_allclose(la, lb, rtol=2e-4)


def test_vmap_sweep_replica_sharded_over_mesh(synth_root):
    """With a mesh, the replica axis shards over 'data': 8 seeds on 8
    virtual devices (one replica per chip, zero collectives) must still
    reproduce the serial runs."""
    cfg = _base(synth_root, device_loop=True, mesh_shape=(8,), epoch=2,
                patience=2)
    stacked = train_seed_sweep(cfg, seeds=list(range(1, 9)))
    assert len(stacked) == 8
    for r in stacked[:3]:  # spot-check three replicas against serial
        serial = trainable(cfg.replace(seed=r["seed"], data_seed=1,
                                       mesh_shape=(), rng_impl="threefry2x32"))
        assert r["best_iter"] == serial["best_iter"], r["seed"]
        for k in ("mse", "mae"):
            np.testing.assert_allclose(r[k], serial[k], rtol=2e-4,
                                       err_msg=f"seed {r['seed']} {k}")


def test_vmap_sweep_resume_equals_uninterrupted(synth_root, tmp_path):
    """Stacked-sweep checkpoint/resume: interrupt at epoch 2, resume to
    the full budget — identical per-replica results to the uninterrupted
    run (the trainable() resume contract, now for the stacked mode)."""
    cfg = _base(synth_root, epoch=4, patience=4, device_loop=True)
    full = train_seed_sweep(cfg, seeds=[1, 2],
                            checkpoint_dir=str(tmp_path / "full"))

    train_seed_sweep(cfg.replace(epoch=2), seeds=[1, 2],
                     checkpoint_dir=str(tmp_path / "res"))
    resumed = train_seed_sweep(cfg.replace(load="resume"), seeds=[1, 2],
                               checkpoint_dir=str(tmp_path / "res"))

    for rf, rr in zip(full, resumed):
        assert rr["best_iter"] == rf["best_iter"], rf["seed"]
        for k in ("mse", "mae", "rmse"):
            np.testing.assert_allclose(rr[k], rf[k], rtol=0, atol=0,
                                       err_msg=f"seed {rf['seed']} {k}")
        assert [h["epoch"] for h in rr["history"]] == [0, 1, 2, 3]


def test_vmap_sweep_saves_best_weights(synth_root, tmp_path):
    """best/ holds the per-replica best-epoch WEIGHTS (stacked): replica
    i's slice matches the serial trainable run's own best/ checkpoint, and
    replicas.json + config.json are written so the reported models are
    recoverable (the rolling train-state keeps only the last 2 epochs)."""
    import json
    import os

    import jax

    from imm_tsf_tpu.training.checkpoint import load_checkpoint

    cfg = _base(synth_root, epoch=4, patience=4)
    ckdir = str(tmp_path / "sweep")
    out = train_seed_sweep(cfg, seeds=[1, 2], checkpoint_dir=ckdir)

    bp, _, _ = load_checkpoint(os.path.join(ckdir, "best"))
    with open(os.path.join(ckdir, "best", "replicas.json")) as f:
        rep = json.load(f)
    assert rep["seeds"] == [1, 2]
    assert rep["best_iter"] == [r["best_iter"] for r in out]
    assert os.path.exists(os.path.join(ckdir, "config.json"))

    for i, r in enumerate(out):
        sdir = str(tmp_path / f"serial{i}")
        trainable(cfg.replace(seed=r["seed"], data_seed=1,
                              rng_impl="threefry2x32"),
                  checkpoint_dir=sdir)
        sp, _, _ = load_checkpoint(os.path.join(sdir, "best"))
        for b, s in zip(jax.tree_util.tree_leaves(bp),
                        jax.tree_util.tree_leaves(sp)):
            np.testing.assert_allclose(np.asarray(b)[i], np.asarray(s),
                                       rtol=2e-4, atol=1e-6)


def test_vmap_sweep_no_test_split_reports_best_epoch_val(synth_root):
    """With test_dataloader=None each replica's reported metrics are its
    BEST-epoch val (matching best_iter and the saved best/ weights), not
    the final epoch's val."""
    from imm_tsf_tpu.data.loader import parse_datasets

    cfg = _base(synth_root, epoch=4, patience=4)
    data_obj = parse_datasets(cfg, verbose=False)
    data_obj["test_dataloader"] = None
    out = train_seed_sweep(cfg, seeds=[1, 2], data_obj=data_obj)
    for r in out:
        vals = [h["val"]["mse"] for h in r["history"]]
        best_epoch_val = min(vals)
        np.testing.assert_allclose(r["mse"], best_epoch_val, rtol=1e-6)
        assert r["history"][r["best_iter"]]["val"]["mse"] == best_epoch_val
