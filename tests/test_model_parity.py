"""Numeric parity vs the torch reference with IDENTICAL weights.

Maps torch module weights into our flax params and compares forward
outputs on the same batch — the strongest form of the golden-value tests
SURVEY.md §4 prescribes. Skipped when /root/reference is absent."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    for name in ("prettytable", "tqdm"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                if name == "prettytable":
                    mod.PrettyTable = type("PT", (), {"__init__": lambda s, *a, **k: None,
                                                      "add_row": lambda s, *a: None})
                else:
                    mod.tqdm = lambda x, *a, **k: x
                sys.modules[name] = mod
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def test_dlinear_forward_parity():
    import argparse

    import jax
    import torch

    from models.DLinear import DLinear as RefDLinear

    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.models.dlinear import DLinear

    B, L, Lp, C = 4, 14, 10, 3
    targs = argparse.Namespace(input_len=L, pred_len=Lp, enc_in=C, moving_avg=25,
                               batch_size=B, device=torch.device("cpu"))
    torch.manual_seed(0)
    ref = RefDLinear(targs)
    ref.eval()

    rng = np.random.default_rng(0)
    mask = (rng.random((B, L, C)) > 0.3).astype(np.float32)
    data = (rng.standard_normal((B, L, C)) * mask).astype(np.float32)
    tp = np.sort(rng.random((B, L)).astype(np.float32), axis=1)
    tpp = np.sort(1 + rng.random((B, Lp)).astype(np.float32), axis=1)

    with torch.no_grad():
        ref_out = ref.forecasting(
            torch.tensor(tpp), torch.tensor(data), torch.tensor(tp), torch.tensor(mask)
        ).numpy()

    cfg = Config(model="DLinear", input_dim=C, input_len=L, pred_len=Lp,
                 batch_size=B, moving_avg=25)
    model = DLinear(cfg)
    variables = model.init(jax.random.PRNGKey(0), tpp, data, tp, mask)
    params = variables["params"]
    # inject torch weights (torch Linear weight [out,in] -> flax kernel [in,out])
    for tname, jname in [("Linear_Seasonal", "seasonal"), ("Linear_Trend", "trend"),
                         ("Linear_Time", "time")]:
        lin = getattr(ref, tname)
        params[jname]["kernel"] = lin.weight.detach().numpy().T
        params[jname]["bias"] = lin.bias.detach().numpy()

    our_out = np.asarray(model.apply({"params": params}, tpp, data, tp, mask))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-5)


def test_ttf_recavg_forward_parity(ragged_fusion_batch):
    import jax
    import torch

    from fusions.TTF_RecAvg import TTF_RecAvg as RefTTF

    from imm_tsf_tpu.fusion.ttf import TTF_RecAvg

    f = ragged_fusion_batch
    d_txt, d_model = 8, 8
    torch.manual_seed(1)

    # build ref without LLM load (use_text_embeddings=True path)
    ref = RefTTF.__new__(RefTTF)
    torch.nn.Module.__init__(ref)
    ref.use_text_embeddings = True
    ref.input_proj = torch.nn.Linear(d_model, d_txt)
    ref.d_txt = d_txt
    ref.max_length = 64
    ref.log_recency_sigma = torch.nn.Parameter(torch.log(torch.tensor(1.5)))
    ref.proj = torch.nn.Linear(d_txt, d_txt)
    ref.layer_norm = torch.nn.LayerNorm(d_txt)
    ref.dropout = torch.nn.Dropout(0.0)
    ref.eval()

    with torch.no_grad():
        ref_E, ref_M = ref(
            torch.tensor(f["notes"]), torch.tensor(f["tau"]), torch.tensor(f["t_hat"])
        )

    mod = TTF_RecAvg(d_txt=d_txt, d_model_llm=d_model, recency_sigma=1.5, dropout=0.0)
    variables = mod.init(jax.random.PRNGKey(0), f["notes"], f["tau"], f["t_hat"])
    p = variables["params"]
    p["input_proj"]["kernel"] = ref.input_proj.weight.detach().numpy().T
    p["input_proj"]["bias"] = ref.input_proj.bias.detach().numpy()
    p["proj"]["kernel"] = ref.proj.weight.detach().numpy().T
    p["proj"]["bias"] = ref.proj.bias.detach().numpy()
    p["layer_norm"]["scale"] = ref.layer_norm.weight.detach().numpy()
    p["layer_norm"]["bias"] = ref.layer_norm.bias.detach().numpy()
    p["log_recency_sigma"] = ref.log_recency_sigma.detach().numpy()

    E, M = mod.apply({"params": p}, f["notes"], f["tau"], f["t_hat"])
    np.testing.assert_allclose(np.asarray(E), ref_E.numpy(), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(M), ref_M.numpy())


def test_mmf_xattn_forward_parity():
    import jax
    import torch

    from fusions.MMF_XAttn_Add import MMF_XAttn_Add as RefMMF

    from imm_tsf_tpu.fusion.mmf import MMF_XAttn_Add

    B, T, C, d_txt = 3, 5, 3, 8
    torch.manual_seed(2)
    ref = RefMMF(d_txt=d_txt, C=C, d_attn=d_txt, n_heads_fusion=2, dropout=0.0,
                 kappa=0.5)
    ref.eval()

    rng = np.random.default_rng(3)
    Y = rng.standard_normal((B, T, C)).astype(np.float32)
    E = rng.standard_normal((B, T, d_txt)).astype(np.float32)
    M = np.array([[True], [True], [False]])
    with torch.no_grad():
        ref_out = ref(torch.tensor(Y), torch.tensor(E), torch.tensor(M)).numpy()

    mod = MMF_XAttn_Add(d_txt=d_txt, C=C, d_attn=d_txt, n_heads_fusion=2,
                        dropout=0.0, kappa=0.5)
    import jax.numpy as jnp

    variables = mod.init(jax.random.PRNGKey(0), Y, E, jnp.asarray(M))
    p = variables["params"]
    t2np = lambda x: x.detach().numpy()
    p["proj_q"]["kernel"] = t2np(ref.proj_q.weight).T
    p["proj_k"]["kernel"] = t2np(ref.proj_k.weight).T
    p["proj_v"]["kernel"] = t2np(ref.proj_v.weight).T
    w = t2np(ref.attn.in_proj_weight)
    b = t2np(ref.attn.in_proj_bias)
    E_dim = d_txt
    p["attn"]["q_proj"] = {"kernel": w[:E_dim].T, "bias": b[:E_dim]}
    p["attn"]["k_proj"] = {"kernel": w[E_dim:2 * E_dim].T, "bias": b[E_dim:2 * E_dim]}
    p["attn"]["v_proj"] = {"kernel": w[2 * E_dim:].T, "bias": b[2 * E_dim:]}
    p["attn"]["out_proj"] = {"kernel": t2np(ref.attn.out_proj.weight).T,
                             "bias": t2np(ref.attn.out_proj.bias)}
    p["residual_head"]["kernel"] = t2np(ref.residual_head.weight).T
    p["residual_head"]["bias"] = t2np(ref.residual_head.bias)
    p["layer_norm"]["scale"] = t2np(ref.layer_norm.weight)
    p["layer_norm"]["bias"] = t2np(ref.layer_norm.bias)

    out = np.asarray(mod.apply({"params": p}, Y, E, jnp.asarray(M)))
    np.testing.assert_allclose(out, ref_out, atol=2e-5)
