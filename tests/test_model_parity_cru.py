"""CRU weight-level FORWARD parity vs the torch reference: identical
weights + identical inputs -> identical forecasting outputs. This is the
<1e-4-class parity evidence for the Kalman scan (Van Loan expm, factorized
update, pre-L2 encoder, banded locally-linear transitions)."""

import os

import jax
import numpy as np
import pytest

from ref_shims import REF, ref_default_args, reference_path

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

LSD, HID, C = 8, 16, 3


def _batch(B=4, L=10, Lp=6, seed=3):
    rng = np.random.default_rng(seed)
    tp = np.sort(rng.random((B, L)).astype(np.float32) * 7, axis=1)
    tpp = 7 + np.sort(rng.random((B, Lp)).astype(np.float32) * 7, axis=1)
    mask = (rng.random((B, L, C)) > 0.4).astype(np.float32)
    mask[:, 0, 0] = 1.0
    data = rng.standard_normal((B, L, C)).astype(np.float32) * mask
    return tpp, data, tp, mask


def test_cru_forward_weight_parity():
    import torch

    args = ref_default_args(cru_lsd=LSD, cru_hidden_units=HID,
                            input_len=10, pred_len=6, enc_in=C)
    with reference_path():
        from models.CRU import CRU as RefCRU

        torch.manual_seed(0)
        ref = RefCRU(args)
        core = ref.cru_model_core
        cell = core._cru_layer._cell
        with torch.no_grad():  # zero-init basis would make expm trivial (I)
            for b in (cell._tm_11_basis, cell._tm_12_basis,
                      cell._tm_21_basis, cell._tm_22_basis):
                b.normal_(0, 0.3)

        tpp, data, tp, mask = _batch()
        with torch.no_grad():
            ref_out = ref.forecasting(
                torch.tensor(tpp), torch.tensor(data),
                torch.tensor(tp), torch.tensor(mask),
            ).numpy()

        # ---- copy weights -> our param dict ----
        t = lambda x: np.asarray(x.detach())
        d = lambda lin: {"kernel": t(lin.weight).T, "bias": t(lin.bias)}
        enc = core._enc._module
        dec = core._dec._module
        p = {}
        for i, li in enumerate((0, 3, 6)):
            lin, ln = enc._hidden_layers[li], enc._hidden_layers[li + 2]
            p[f"enc_fc{i}_kernel"] = t(lin.weight).T
            p[f"enc_fc{i}_bias"] = t(lin.bias)
            p[f"enc_ln{i}_scale"] = t(ln.weight)
            p[f"enc_ln{i}_bias"] = t(ln.bias)
        p["enc_mean_kernel"] = t(enc._mean_layer.weight).T
        p["enc_mean_bias"] = t(enc._mean_layer.bias)
        p["enc_logvar_kernel"] = t(enc._log_var_layer.weight).T
        p["enc_logvar_bias"] = t(enc._log_var_layer.bias)
        for k, b in (("11", cell._tm_11_basis), ("12", cell._tm_12_basis),
                     ("21", cell._tm_21_basis), ("22", cell._tm_22_basis)):
            p[f"tm_{k}_basis"] = t(b)
        p["coefficient_net_kernel"] = t(cell._coefficient_net[0].weight).T
        p["coefficient_net_bias"] = t(cell._coefficient_net[0].bias)
        p["log_transition_noise"] = t(cell._log_transition_noise)
        p["log_icu"] = t(core._log_icu)
        p["log_icl"] = t(core._log_icl)
        for i, li in enumerate((0, 3, 6)):
            lin, ln = dec._hidden_layers_mean[li], dec._hidden_layers_mean[li + 2]
            p[f"dec_mean_fc{i}_kernel"] = t(lin.weight).T
            p[f"dec_mean_fc{i}_bias"] = t(lin.bias)
            p[f"dec_mean_ln{i}_scale"] = t(ln.weight)
            p[f"dec_mean_ln{i}_bias"] = t(ln.bias)
        p["dec_out_mean_kernel"] = t(dec._out_layer_mean.weight).T
        p["dec_out_mean_bias"] = t(dec._out_layer_mean.bias)

    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.models import get_model

    cfg = Config(model="CRU", input_dim=C, input_len=10, pred_len=6,
                 batch_size=4, cru_lsd=LSD, cru_hidden_units=HID)
    model = get_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           tpp, data, tp, mask)
    missing = set(variables["params"]) ^ set(p)
    assert not missing, f"param name mismatch: {missing}"
    ours = np.asarray(model.apply({"params": p}, tpp, data, tp, mask))

    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=5e-5, rtol=1e-4)
