"""compute_dtype="amp_bf16" — true mixed precision for the backbone.

Reference analog: torch.autocast AMP in /root/reference/main.py:1080-1091
(fp32 master params, half-precision forward). Here: fp32 master params +
optimizer state, model params/inputs cast to bf16 at use inside
make_forward, fusion stack and loss kept fp32 (trainer.py:make_forward).

Pins: (1) params/opt state stay fp32 after an amp train step; (2) the amp
loss tracks the fp32 loss within bf16 rounding tolerance; (3) the dtype
plumbing composes with the spectral models (FFT upcast) and the fusion
stack; (4) eval path returns finite fp32 metric sums.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bench import build_batch
from imm_tsf_tpu.config import Config, MODEL_PRESETS
from imm_tsf_tpu.training.optim import make_optimizer
from imm_tsf_tpu.training.trainer import build_steps, init_state
from imm_tsf_tpu.models import get_model

B, L, Lp, C = 8, 48, 24, 4


def _mk(model="PatchTST", enable_text=False, **kw):
    cfg = Config(model=model, input_dim=C, input_len=L, pred_len=Lp,
                 batch_size=B, stride=8, history=L,
                 enable_text=enable_text, use_text_embeddings=enable_text,
                 **kw)
    return cfg.replace(**MODEL_PRESETS.get(model, {}))


def _one_step(cfg, batch, seed=0):
    model = get_model(cfg)
    fusion = None
    if cfg.enable_text:
        from imm_tsf_tpu.fusion.fusion_model import FusionModel

        fusion = FusionModel(cfg)
    rng = jax.random.PRNGKey(seed)
    params, stats = init_state(cfg, model, fusion, batch, rng)
    tx = make_optimizer(cfg.lr, cfg.w_decay)
    opt_state = tx.init(params)
    train_step, eval_step = build_steps(cfg, model, fusion, tx)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    params, stats, opt_state, loss = train_step(params, stats, opt_state,
                                                dev, rng)
    sums = eval_step(params, stats, dev)
    return params, float(loss), {k: np.asarray(v) for k, v in sums.items()}


def test_amp_params_stay_fp32_and_loss_tracks_fp32():
    batch = build_batch(B=B, L=L, Lp=Lp, C=C, N=4, d_txt=32)
    cfg32 = _mk("PatchTST", enable_text=True, d_txt=32,
                llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
                MMF_module="MMF_GR_Add")
    p32, loss32, _ = _one_step(cfg32, batch)
    pamp, lossamp, sums = _one_step(
        cfg32.replace(compute_dtype="amp_bf16"), batch)
    # master params never leave fp32
    for leaf in jax.tree_util.tree_leaves(pamp):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    # same init => first-step loss equal within bf16 rounding of the
    # forward (loose: activations round at ~2^-8 relative)
    assert np.isfinite(lossamp)
    assert abs(lossamp - loss32) / max(abs(loss32), 1e-6) < 0.05
    # ...but NOT bit-identical: bit-equality would mean the bf16 cast never
    # engaged (a silent-no-op regression this test must catch)
    assert lossamp != loss32
    for v in sums.values():
        assert np.all(np.isfinite(v))


@pytest.mark.parametrize("model", ["TimesNet", "TimeMixer", "TTM",
                                   "Informer", "DLinear"])
def test_amp_composes_with_model_zoo(model):
    batch = build_batch(B=B, L=L, Lp=Lp, C=C, N=4, d_txt=32)
    cfg = _mk(model).replace(compute_dtype="amp_bf16")
    _, loss, sums = _one_step(cfg, batch)
    assert np.isfinite(loss)
    for v in sums.values():
        assert np.all(np.isfinite(v))


@pytest.mark.parametrize("model", ["CRU", "LatentODE", "NeuralFlow",
                                   "tPatchGNN"])
def test_amp_refused_for_continuous_time_models(model):
    """amp_bf16 would quantize timestamp differences (dt) to bf16 for the
    continuous-time family; make_forward must refuse loudly rather than
    silently degrade the dynamics (trainer.py:TIME_DYNAMICS_MODELS)."""
    from imm_tsf_tpu.training.trainer import make_forward

    cfg = _mk(model).replace(compute_dtype="amp_bf16")
    with pytest.raises(ValueError, match="amp_bf16"):
        make_forward(cfg, get_model(cfg), None)


def test_compute_dtype_typo_raises():
    """A typo'd mode ('amp-bf16') must not silently fall through to the
    fp32 path (Config.__post_init__ validation)."""
    with pytest.raises(ValueError, match="compute_dtype"):
        _mk("DLinear", compute_dtype="amp-bf16")
    with pytest.raises(ValueError, match="compute_dtype"):
        _mk("DLinear").replace(compute_dtype="AMP_BF16")
    with pytest.raises(ValueError, match="dropout_impl"):
        _mk("DLinear").replace(dropout_impl="fash")
    with pytest.raises(ValueError, match="frozen_param_dtype"):
        _mk("DLinear").replace(frozen_param_dtype="fp16")


def test_amp_batchnorm_stats_stay_fp32():
    """Informer's distil ConvLayer carries BatchNorm running stats; under
    amp they must be stored AND updated in fp32 (only the params
    collection is cast to bf16 in make_forward)."""
    batch = build_batch(B=B, L=L, Lp=Lp, C=C, N=4, d_txt=32)
    cfg = _mk("Informer").replace(compute_dtype="amp_bf16")
    model = get_model(cfg)
    rng = jax.random.PRNGKey(0)
    params, stats = init_state(cfg, model, None, batch, rng)
    tx = make_optimizer(cfg.lr, cfg.w_decay)
    opt_state = tx.init(params)
    train_step, _ = build_steps(cfg, model, None, tx)
    dev = {k: jnp.asarray(v) for k, v in batch.items()}
    params, stats, opt_state, loss = train_step(params, stats, opt_state,
                                                dev, rng)
    leaves = jax.tree_util.tree_leaves(stats["model"])
    assert leaves, "Informer should carry BatchNorm batch_stats"
    for leaf in leaves:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
