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
    for name in ("prettytable", "tqdm", "reformer_pytorch"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                mod = types.ModuleType(name)
                if name == "prettytable":
                    mod.PrettyTable = type("PT", (), {"__init__": lambda s, *a, **k: None,
                                                      "add_row": lambda s, *a: None})
                elif name == "reformer_pytorch":
                    mod.LSHSelfAttention = object  # unused dead import
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


def test_patchtst_forward_parity():
    """Full-backbone parity: patch embedding + TSLib encoder + flatten head."""
    import argparse

    import jax
    import torch

    from models.PatchTST import PatchTST as RefPatchTST

    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.models.patchtst import PatchTST

    B, L, Lp, C = 3, 14, 10, 2
    targs = argparse.Namespace(
        input_len=L, pred_len=Lp, enc_in=C, d_model=16, d_ff=32, n_heads=2,
        e_layers=1, dropout=0.0, activation="gelu", factor=1,
        batch_size=B, device=torch.device("cpu"),
    )
    torch.manual_seed(5)
    ref = RefPatchTST(targs)
    ref.eval()

    rng = np.random.default_rng(5)
    mask = (rng.random((B, L, C)) > 0.3).astype(np.float32)
    data = (rng.standard_normal((B, L, C)) * mask).astype(np.float32)
    tp = np.sort(rng.random((B, L)).astype(np.float32), axis=1)
    tpp = np.sort(1 + rng.random((B, Lp)).astype(np.float32), axis=1)
    with torch.no_grad():
        ref_out = ref.forecasting(
            torch.tensor(tpp), torch.tensor(data), torch.tensor(tp),
            torch.tensor(mask),
        ).numpy()

    cfg = Config(model="PatchTST", input_dim=C, input_len=L, pred_len=Lp,
                 batch_size=B, d_model=16, d_ff=32, n_heads=2, e_layers=1,
                 dropout=0.0, activation="gelu")
    model = PatchTST(cfg)
    variables = model.init(jax.random.PRNGKey(0), tpp, data, tp, mask)
    p = variables["params"]
    t2np = lambda x: x.detach().numpy()
    d = lambda lin: {"kernel": t2np(lin.weight).T, "bias": t2np(lin.bias)}
    ln = lambda m: {"scale": t2np(m.weight), "bias": t2np(m.bias)}
    conv1d = lambda cv: {"kernel": t2np(cv.weight)[:, :, 0].T, "bias": t2np(cv.bias)}

    p["patch_embedding"]["value_embedding"] = {
        "kernel": t2np(ref.patch_embedding.value_embedding.weight).T
    }
    el = ref.encoder.attn_layers[0]
    # flax namespaces the AttentionLayer where it was constructed (model scope)
    pa = p["AttentionLayer_0"]
    pa["query_projection"] = d(el.attention.query_projection)
    pa["key_projection"] = d(el.attention.key_projection)
    pa["value_projection"] = d(el.attention.value_projection)
    pa["out_projection"] = d(el.attention.out_projection)
    pj = p["enc_layer_0"]
    pj["conv1"] = conv1d(el.conv1)
    pj["conv2"] = conv1d(el.conv2)
    pj["norm1"] = ln(el.norm1)
    pj["norm2"] = ln(el.norm2)
    p["encoder"]["norm"] = ln(ref.encoder.norm)
    p["head_linear"] = d(ref.head.linear)

    out = np.asarray(model.apply({"params": p}, tpp, data, tp, mask))
    np.testing.assert_allclose(out, ref_out, atol=2e-4)


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


def test_ttf_t2v_xattn_forward_parity(ragged_fusion_batch):
    """Includes the single-query broadcast optimization: outputs must equal
    the reference's per-t_hat recomputed attentions exactly."""
    import jax
    import jax.numpy as jnp
    import torch

    from fusions.TTF_T2V_XAttn import TTF_T2V_XAttn as RefTTF

    from imm_tsf_tpu.fusion.ttf import TTF_T2V_XAttn

    f = ragged_fusion_batch
    d_txt, d_model = 8, 8
    torch.manual_seed(4)
    ref = RefTTF.__new__(RefTTF)
    torch.nn.Module.__init__(ref)
    ref.use_text_embeddings = True
    ref.input_proj = torch.nn.Linear(d_model, d_txt)
    ref.d_txt = d_txt
    ref.d_tau = d_txt // 2
    ref.max_length = 64
    ref.time2vec = __import__("fusions.TTF_T2V_XAttn", fromlist=["Time2Vec"]).Time2Vec(ref.d_tau)
    ref.KV_proj = torch.nn.Linear(d_txt + ref.d_tau, d_txt)
    ref.attn = torch.nn.MultiheadAttention(d_txt, 2, dropout=0.0, batch_first=True)
    ref.layer_norm = torch.nn.LayerNorm(d_txt)
    ref.dropout = torch.nn.Dropout(0.0)
    ref.proj_out = torch.nn.Linear(d_txt, d_txt)
    ref.Q_param = torch.nn.Parameter(torch.randn(1, 1, d_txt))
    ref.eval()

    with torch.no_grad():
        ref_E, ref_M = ref(
            torch.tensor(f["notes"]), torch.tensor(f["tau"]), torch.tensor(f["t_hat"])
        )

    mod = TTF_T2V_XAttn(d_txt=d_txt, d_model_llm=d_model, n_heads_fusion=2,
                        dropout=0.0)
    variables = mod.init(jax.random.PRNGKey(0), f["notes"], f["tau"], f["t_hat"])
    p = variables["params"]
    t2np = lambda x: x.detach().numpy()
    p["input_proj"] = {"kernel": t2np(ref.input_proj.weight).T,
                       "bias": t2np(ref.input_proj.bias)}
    p["time2vec"]["linear"] = {"kernel": t2np(ref.time2vec.linear.weight).T,
                               "bias": t2np(ref.time2vec.linear.bias)}
    p["time2vec"]["periodic"] = {"kernel": t2np(ref.time2vec.periodic.weight).T,
                                 "bias": t2np(ref.time2vec.periodic.bias)}
    p["KV_proj"] = {"kernel": t2np(ref.KV_proj.weight).T, "bias": t2np(ref.KV_proj.bias)}
    w = t2np(ref.attn.in_proj_weight)
    b = t2np(ref.attn.in_proj_bias)
    E = d_txt
    p["attn"]["q_proj"] = {"kernel": w[:E].T, "bias": b[:E]}
    p["attn"]["k_proj"] = {"kernel": w[E:2 * E].T, "bias": b[E:2 * E]}
    p["attn"]["v_proj"] = {"kernel": w[2 * E:].T, "bias": b[2 * E:]}
    p["attn"]["out_proj"] = {"kernel": t2np(ref.attn.out_proj.weight).T,
                             "bias": t2np(ref.attn.out_proj.bias)}
    p["layer_norm"]["scale"] = t2np(ref.layer_norm.weight)
    p["layer_norm"]["bias"] = t2np(ref.layer_norm.bias)
    p["proj_out"] = {"kernel": t2np(ref.proj_out.weight).T,
                     "bias": t2np(ref.proj_out.bias)}
    p["Q_param"] = t2np(ref.Q_param)

    E_out, M_out = mod.apply({"params": p}, f["notes"], f["tau"], f["t_hat"])
    np.testing.assert_allclose(np.asarray(E_out), ref_E.numpy(), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(M_out), ref_M.numpy())


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
