"""Fusion-stack tests on the canonical ragged fixture (incl. empty-notes
sample) — the shape/NaN contracts the reference encodes as __main__ smoke
tests (fusions/TTF_RecAvg.py:116-173 etc.)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.fusion.fusion_model import FusionModel
from imm_tsf_tpu.fusion.mmf import MMF_GR_Add, MMF_XAttn_Add
from imm_tsf_tpu.fusion.ttf import TTF_RecAvg, TTF_T2V_XAttn


@pytest.mark.parametrize("ttf_cls", [TTF_RecAvg, TTF_T2V_XAttn])
def test_ttf_shapes_and_masks(ragged_fusion_batch, ttf_cls):
    f = ragged_fusion_batch
    mod = ttf_cls(d_txt=8, d_model_llm=8)
    variables = mod.init(jax.random.PRNGKey(0), f["notes"], f["tau"], f["t_hat"])
    E_txt, M_txt = mod.apply(variables, f["notes"], f["tau"], f["t_hat"])
    B, T_f = f["t_hat"].shape
    assert E_txt.shape == (B, T_f, 8)
    assert M_txt.shape == (B, 1)
    assert not np.isnan(np.asarray(E_txt)).any()
    # presence mask: sample 2 has no notes
    np.testing.assert_array_equal(np.asarray(M_txt[:, 0]), [True, True, False])


@pytest.mark.parametrize("mmf_cls", [MMF_GR_Add, MMF_XAttn_Add])
def test_mmf_no_text_passthrough(ragged_fusion_batch, mmf_cls):
    f = ragged_fusion_batch
    B, T_f = f["t_hat"].shape
    C = 3
    rng = np.random.default_rng(1)
    Y_ts = jnp.asarray(rng.standard_normal((B, T_f, C)), jnp.float32)
    E_txt = jnp.asarray(rng.standard_normal((B, T_f, 8)), jnp.float32)
    M_txt = jnp.asarray([[True], [True], [False]])
    kw = dict(d_txt=8, C=C)
    mod = (mmf_cls(hidden_dim=C, **kw) if mmf_cls is MMF_GR_Add
           else mmf_cls(d_attn=8, **kw))
    variables = mod.init(jax.random.PRNGKey(0), Y_ts, E_txt, M_txt)
    out = mod.apply(variables, Y_ts, E_txt, M_txt)
    assert out.shape == (B, T_f, C)
    assert not np.isnan(np.asarray(out)).any()
    # no-text sample passes through unchanged:
    #   GR_Add: gate forced to 1 -> Y (MMF_GR_Add.py:57)
    #   XAttn_Add: delta zeroed -> Y/(1+k) ... actually (Y+k*0)/(1+k)
    if mmf_cls is MMF_GR_Add:
        np.testing.assert_allclose(np.asarray(out[2]), np.asarray(Y_ts[2]), atol=1e-6)
    else:
        np.testing.assert_allclose(
            np.asarray(out[2]), np.asarray(Y_ts[2]) / 2.0, atol=1e-6
        )


def test_recavg_weights_math(ragged_fusion_batch):
    """Gaussian recency weights: w = exp(-(max(t_hat - tau, 0)/sigma)^2),
    masked (reference TTF_RecAvg.py:94-97)."""
    f = ragged_fusion_batch
    mod = TTF_RecAvg(d_txt=8, d_model_llm=8, recency_sigma=2.0, dropout=0.0)
    variables = mod.init(jax.random.PRNGKey(0), f["notes"], f["tau"], f["t_hat"])
    p = variables["params"]
    np.testing.assert_allclose(
        float(p["log_recency_sigma"]), np.log(2.0), rtol=1e-6
    )
    # manual weighted average for sample 1 (all notes valid)
    V = f["notes"] @ np.asarray(p["input_proj"]["kernel"]) + np.asarray(
        p["input_proj"]["bias"]
    )
    delta = np.clip(f["t_hat"][:, None, :] - f["tau"][:, :, None], 0, None)
    w = np.exp(-((delta / 2.0) ** 2))
    note_mask = np.abs(f["notes"]).sum(-1) > 0
    w = w * note_mask[:, :, None]
    E_raw = np.einsum("bnt,bnd->btd", w, V) / np.clip(
        w.sum(1), 1e-6, None
    )[:, :, None]
    # compare against module up to layer_norm+proj by re-applying those
    import flax.linen as nn

    ln = nn.LayerNorm()
    E_norm = ln.apply({"params": p["layer_norm"]}, E_raw)
    E_ref = E_norm @ np.asarray(p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"])
    E_txt, _ = mod.apply(variables, f["notes"], f["tau"], f["t_hat"])
    np.testing.assert_allclose(np.asarray(E_txt), np.asarray(E_ref), atol=1e-4)


def test_fusion_model_composition(ragged_fusion_batch):
    f = ragged_fusion_batch
    B, T_f = f["t_hat"].shape
    C = 3
    for ttf in ["TTF_RecAvg", "TTF_T2V_XAttn"]:
        for mmf in ["MMF_GR_Add", "MMF_XAttn_Add"]:
            cfg = Config(TTF_module=ttf, MMF_module=mmf, d_txt=8,
                         llm_model_fusion="GPT2", input_dim=C, kappa=0.5)
            fm = FusionModel(cfg)
            Y_ts = jnp.ones((B, T_f, C))
            variables = fm.init(
                jax.random.PRNGKey(0), f["notes"], f["tau"], f["t_hat"], Y_ts
            )
            out = fm.apply(variables, f["notes"], f["tau"], f["t_hat"], Y_ts)
            assert out.shape == (B, T_f, C)
            assert not np.isnan(np.asarray(out)).any()


def test_torch_mha_parity():
    """Our MultiHeadAttention == torch nn.MultiheadAttention given the same
    weights (validates fusion attention numerics)."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn_flax

    from imm_tsf_tpu.layers.attention import MultiHeadAttention

    E, H, B, Tq, Tk = 16, 4, 3, 5, 7
    rng = np.random.default_rng(0)
    q = rng.standard_normal((B, Tq, E)).astype(np.float32)
    k = rng.standard_normal((B, Tk, E)).astype(np.float32)
    v = rng.standard_normal((B, Tk, E)).astype(np.float32)
    pad = np.zeros((B, Tk), bool)
    pad[1, 4:] = True

    tm = torch.nn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    tm.eval()
    with torch.no_grad():
        t_out, _ = tm(
            torch.tensor(q), torch.tensor(k), torch.tensor(v),
            key_padding_mask=torch.tensor(pad),
        )

    w = tm.in_proj_weight.detach().numpy()  # [3E, E]
    b = tm.in_proj_bias.detach().numpy()
    params = {
        "q_proj": {"kernel": w[:E].T, "bias": b[:E]},
        "k_proj": {"kernel": w[E : 2 * E].T, "bias": b[E : 2 * E]},
        "v_proj": {"kernel": w[2 * E :].T, "bias": b[2 * E :]},
        "out_proj": {
            "kernel": tm.out_proj.weight.detach().numpy().T,
            "bias": tm.out_proj.bias.detach().numpy(),
        },
    }
    mod = MultiHeadAttention(E, H, 0.0)
    j_out = mod.apply({"params": params}, q, k, v, key_padding_mask=jnp.asarray(pad))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-5)


def test_mmf_gru_matches_torch():
    """The custom precomputed-input GRU scan is torch-exact: copy torch
    nn.GRU weights and compare hidden trajectories."""
    import torch

    from imm_tsf_tpu.fusion.mmf import MMF_GR_Add

    B, T, C, d_txt, H = 3, 6, 2, 5, 4
    rng = np.random.default_rng(0)
    Y_ts = rng.standard_normal((B, T, C)).astype(np.float32)
    E_txt = rng.standard_normal((B, T, d_txt)).astype(np.float32)
    x = np.concatenate([Y_ts, E_txt], -1)

    torch.manual_seed(0)
    tgru = torch.nn.GRU(C + d_txt, H, batch_first=True)
    with torch.no_grad():
        t_out, _ = tgru(torch.tensor(x))
    t_out = t_out.numpy()

    mod = MMF_GR_Add(d_txt=d_txt, C=C, hidden_dim=H)
    M_txt = jnp.asarray([[True]] * B)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(Y_ts),
                         jnp.asarray(E_txt), M_txt)
    p = dict(variables["params"])
    t = lambda w: np.asarray(w.detach())
    p["gru_w_ih"] = t(tgru.weight_ih_l0).T  # torch stacks [r; z; n] rows
    p["gru_b_ih"] = t(tgru.bias_ih_l0)
    p["gru_w_hh"] = t(tgru.weight_hh_l0).T
    p["gru_b_hh"] = t(tgru.bias_hh_l0)

    ours = np.asarray(mod.apply({"params": p}, jnp.asarray(x),
                                method=MMF_GR_Add._gru))
    np.testing.assert_allclose(ours, t_out, atol=1e-5)
