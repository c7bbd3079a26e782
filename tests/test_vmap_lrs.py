"""Stacked (seed x learning-rate) sweeps (training/vmap_sweep.py lrs=):
each replica must reproduce its serial `trainable(seed=s, lr=l,
data_seed=base)` run. The per-replica lr rides on the vmapped opt_state
axis via optax.inject_hyperparams (training/optim.py) — the reference
tunes lr serially through tunable_params (reference main.py:1208-1243)."""

import numpy as np

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.training.trainer import trainable
from imm_tsf_tpu.training.vmap_sweep import train_seed_sweep


def _base(synth_root, **over):
    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 batch_size=8, epoch=3, patience=3, seed=1,
                 device_loop=False, host_prefetch=0)
    return cfg.replace(**over)


def test_lr_grid_matches_serial(synth_root):
    cfg = _base(synth_root)
    stacked = train_seed_sweep(cfg, seeds=[1, 2], lrs=[1e-3, 1e-2])
    assert len(stacked) == 4
    assert {(r["seed"], r["lr"]) for r in stacked} == {
        (1, 1e-3), (2, 1e-3), (1, 1e-2), (2, 1e-2)}
    for r in stacked:
        serial = trainable(cfg.replace(seed=r["seed"], lr=r["lr"],
                                       data_seed=1,
                                       rng_impl="threefry2x32"))
        assert r["best_iter"] == serial["best_iter"], (r["seed"], r["lr"])
        for k in ("mse", "mae", "rmse"):
            np.testing.assert_allclose(
                r[k], serial[k], rtol=2e-4,
                err_msg=f"seed {r['seed']} lr {r['lr']} {k}")
        la = [h["train_loss"] for h in r["history"]]
        lb = [h["train_loss"] for h in serial["history"][: len(la)]]
        np.testing.assert_allclose(la, lb, rtol=2e-4)


def test_lr_grid_resident(synth_root):
    """The device-resident stacked path (one lax.scan per S-replica epoch)
    must carry the per-replica lr identically to the streaming path."""
    cfg = _base(synth_root)
    streaming = train_seed_sweep(cfg, seeds=[1], lrs=[1e-3, 1e-2])
    resident = train_seed_sweep(cfg.replace(device_loop=True),
                                seeds=[1], lrs=[1e-3, 1e-2])
    for rs, rr in zip(streaming, resident):
        assert rs["best_iter"] == rr["best_iter"]
        np.testing.assert_allclose(rs["mse"], rr["mse"], rtol=2e-4)


def test_lr_grid_resume_equals_uninterrupted(synth_root, tmp_path):
    """Checkpoint/resume for the lr grid: the per-replica lr leaf lives in
    the (orbax-checkpointed) opt_state hyperparams and must restore
    bit-exactly along with the rest of the stacked train state."""
    cfg = _base(synth_root, epoch=4, patience=4, device_loop=True)
    grid = dict(seeds=[1], lrs=[1e-3, 1e-2])
    full = train_seed_sweep(cfg, **grid,
                            checkpoint_dir=str(tmp_path / "full"))

    train_seed_sweep(cfg.replace(epoch=2), **grid,
                     checkpoint_dir=str(tmp_path / "res"))
    resumed = train_seed_sweep(cfg.replace(load="resume"), **grid,
                               checkpoint_dir=str(tmp_path / "res"))

    for rf, rr in zip(full, resumed):
        assert rr["best_iter"] == rf["best_iter"], rf["lr"]
        for k in ("mse", "mae", "rmse"):
            np.testing.assert_allclose(rr[k], rf[k], rtol=0, atol=0,
                                       err_msg=f"lr {rf['lr']} {k}")


def test_sweep_wraps_raw_text_loaders(synth_root):
    """train_seed_sweep must install the same host-side loader stages as
    trainable() (wrap_data_loaders): raw-text fusion
    (use_text_embeddings=False) previously crashed in init_state because
    batches lacked notes_embeddings."""
    cfg = _base(synth_root, epoch=2, patience=2, enable_text=True,
                use_text_embeddings=False, llm_model_fusion="GPT2",
                llm_layers_fusion=1, TTF_module="TTF_RecAvg",
                MMF_module="MMF_GR_Add")
    out = train_seed_sweep(cfg, seeds=[1, 2])
    for r in out:
        assert np.isfinite(r["mse"]) and r["mse"] > 0
    serial = trainable(cfg.replace(seed=1, data_seed=1,
                                   rng_impl="threefry2x32"))
    ref = next(r for r in out if r["seed"] == 1)
    np.testing.assert_allclose(ref["mse"], serial["mse"], rtol=2e-4)


def test_nan_replica_freezes_not_kills(synth_root):
    """A diverging replica (absurd lr) must be frozen with its
    pre-divergence results kept — not abort the whole grid."""
    cfg = _base(synth_root, epoch=4, patience=4)
    out = train_seed_sweep(cfg, seeds=[1], lrs=[1e-3, 1e12])
    sane = next(r for r in out if r["lr"] == 1e-3)
    assert np.isfinite(sane["mse"]) and not sane.get("diverged")
    crazy = next(r for r in out if r["lr"] == 1e12)
    # the 1e12 replica either diverges (frozen, flagged) or survives with
    # garbage metrics; if it produced NaN it MUST carry the flag
    if not np.isfinite(crazy["mse"]):
        assert crazy.get("diverged")
    # the sane replica matches its serial run despite the sick neighbor
    serial = trainable(cfg.replace(seed=1, lr=1e-3, data_seed=1,
                                   rng_impl="threefry2x32"))
    assert sane["best_iter"] == serial["best_iter"]
    np.testing.assert_allclose(sane["mse"], serial["mse"], rtol=2e-4)


def test_lrs_actually_differ(synth_root):
    """Replicas with different lrs must diverge after the first update
    (the recorded train loss is pre-update, so compare post-update eval)."""
    cfg = _base(synth_root, epoch=1, patience=1)
    out = train_seed_sweep(cfg, seeds=[1], lrs=[1e-4, 1e-1])
    assert out[0]["mse"] != out[1]["mse"]
