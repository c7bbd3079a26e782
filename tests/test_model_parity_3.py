"""Weight-level forward parity, part 3 (VERDICT r1 missing #2): TimeMixer,
TTM, tPatchGNN, Informer full forward — identical weights + identical
inputs must give identical forecasting outputs."""

import os

import numpy as np
import pytest

from ref_shims import REF, ref_default_args, reference_path

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")


def _irregular_batch(B, L, Lp, C, seed=3):
    rng = np.random.default_rng(seed)
    tp = np.sort(rng.random((B, L)).astype(np.float32), axis=1)
    tpp = np.sort(1 + rng.random((B, Lp)).astype(np.float32), axis=1)
    mask = (rng.random((B, L, C)) > 0.35).astype(np.float32)
    mask[:, 0, :] = 1.0
    data = (rng.standard_normal((B, L, C)) * mask).astype(np.float32)
    return tpp, data, tp, mask


def _t(x):
    return np.asarray(x.detach())


def _d(lin):
    return {"kernel": _t(lin.weight).T, "bias": _t(lin.bias)}


def _ln(m):
    return {"scale": _t(m.weight), "bias": _t(m.bias)}


def test_timemixer_forward_weight_parity():
    """reference models/TimeMixer.py:100-326 at the reference's own preset
    (main.py:859-865: e_layers=2 d_model=16 d_ff=32 dsl=3 avg w=2)."""
    import jax
    import torch

    B, L, Lp, C = 4, 14, 7, 3
    args = ref_default_args(
        input_len=L, pred_len=Lp, enc_in=C, c_out=C, batch_size=B,
        e_layers=2, d_model=16, d_ff=32, down_sampling_layers=3,
        down_sampling_method="avg", down_sampling_window=2, dropout=0.0,
    )
    with reference_path():
        from models.TimeMixer import TimeMixer as RefTimeMixer

        torch.manual_seed(11)
        ref = RefTimeMixer(args)
        ref.eval()
        tpp, data, tp, mask = _irregular_batch(B, L, Lp, C)
        with torch.no_grad():
            ref_out = ref.forecasting(
                torch.tensor(tpp), torch.tensor(data), torch.tensor(tp),
                torch.tensor(mask),
            ).numpy()

        from imm_tsf_tpu.config import Config
        from imm_tsf_tpu.models.timemixer import TimeMixer

        cfg = Config(model="TimeMixer", input_dim=C, input_len=L, pred_len=Lp,
                     batch_size=B, e_layers=2, d_model=16, d_ff=32,
                     down_sampling_layers=3, down_sampling_method="avg",
                     down_sampling_window=2, dropout=0.0)
        model = TimeMixer(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            tpp, data, tp, mask,
        )
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        p["enc_embedding"]["value_embedding"]["tokenConv"]["kernel"] = _t(
            ref.enc_embedding.value_embedding.tokenConv.weight
        ).transpose(2, 1, 0)
        p["predict_layer"] = _d(ref.predict_layers[-1])
        p["projection"] = _d(ref.projection)
        n_down = ref.down_layers
        for b, blk in enumerate(ref.pdm_blocks):
            q = p[f"pdm_block_{b}"]
            for i in range(n_down):
                seq = blk.mix_season.down_sampling_layers[i]
                q[f"season_down_{i}"] = {"fc1": _d(seq[0]), "fc2": _d(seq[2])}
                seq = blk.mix_trend.up_sampling_layers[i]
                q[f"trend_up_{i}"] = {"fc1": _d(seq[0]), "fc2": _d(seq[2])}
            q["out_layer"] = {"fc1": _d(blk.out_layer[0]),
                              "fc2": _d(blk.out_layer[2])}

    ours = np.asarray(model.apply({"params": p}, tpp, data, tp, mask))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)


def test_tpatchgnn_forward_weight_parity():
    """reference models/tPatchGNN.py:84-293 full forward: TTCN masked
    softmax, per-layer transformer over patches, time-adaptive adjacency,
    k-hop gcn, Linear aggregation, TE-conditioned decoder."""
    import jax
    import torch

    B, M, L, N, Lp = 2, 3, 5, 2, 4
    HID, TE, ND = 8, 4, 6
    args = ref_default_args(
        hid_dim=HID, te_dim=TE, node_dim=ND, nlayer=2, tf_layer=1,
        n_heads=2, hop=2, outlayer="Linear", npatch=M, C=N, batch_size=B,
    )
    rng = np.random.default_rng(21)
    mask = (rng.random((B, M, L, N)) > 0.4).astype(np.float32)
    mask[:, 0, 0, :] = 1.0
    mask[0, 1] = 0.0  # a fully-empty patch exercises mask_patch
    X = (rng.standard_normal((B, M, L, N)) * mask).astype(np.float32)
    tt = (np.sort(rng.random((B, M, L)), axis=-1)[..., None]
          * np.ones((1, 1, 1, N))).astype(np.float32)
    tpp = np.sort(1 + rng.random((B, Lp)).astype(np.float32), axis=1)

    with reference_path():
        from models.tPatchGNN import tPatchGNN as RefTPG

        torch.manual_seed(13)
        ref = RefTPG(args)
        ref.eval()
        with torch.no_grad():
            ref_out = ref.forecasting(
                torch.tensor(tpp), torch.tensor(X), torch.tensor(tt),
                torch.tensor(mask),
            ).numpy()

        from imm_tsf_tpu.config import Config
        from imm_tsf_tpu.models.tpatchgnn import TPatchGNN

        cfg = Config(model="tPatchGNN", input_dim=N, hid_dim=HID, te_dim=TE,
                     node_dim=ND, nlayer=2, tf_layer=1, n_heads=2, hop=2,
                     outlayer="Linear", batch_size=B, pred_len=Lp)
        model = TPatchGNN(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            tpp, X, tt, mask,
        )
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        p["te_scale"] = _d(ref.te_scale)
        p["te_periodic"] = _d(ref.te_periodic)
        # inline nn.Sequential children are auto-named flat Dense_N:
        # 0-2 Filter_Generators, 3/4 gates layer0, 5/6 gates layer1,
        # 7-9 decoder
        for i, li in enumerate((0, 2, 4)):
            p[f"Dense_{i}"] = _d(ref.Filter_Generators[li])
            p[f"Dense_{7 + i}"] = _d(ref.decoder[li])
        for layer in range(2):
            p[f"Dense_{3 + 2 * layer}"] = _d(ref.nodevec_gate1[layer][0])
            p[f"Dense_{4 + 2 * layer}"] = _d(ref.nodevec_gate2[layer][0])
        p["T_bias"] = _t(ref.T_bias)
        p["nodevec1"] = _t(ref.nodevec1)
        p["nodevec2"] = _t(ref.nodevec2)
        p["temporal_agg"] = _d(ref.temporal_agg[0])
        for layer in range(2):
            for tl in range(1):
                rl = ref.transformer_encoder[layer].layers[tl]
                E = HID
                ipw, ipb = _t(rl.self_attn.in_proj_weight), _t(rl.self_attn.in_proj_bias)
                p[f"tf_{layer}_{tl}"]["self_attn"] = {
                    "q_proj": {"kernel": ipw[:E].T, "bias": ipb[:E]},
                    "k_proj": {"kernel": ipw[E:2 * E].T, "bias": ipb[E:2 * E]},
                    "v_proj": {"kernel": ipw[2 * E:].T, "bias": ipb[2 * E:]},
                    "out_proj": _d(rl.self_attn.out_proj),
                }
                p[f"tf_{layer}_{tl}"]["linear1"] = _d(rl.linear1)
                p[f"tf_{layer}_{tl}"]["linear2"] = _d(rl.linear2)
                p[f"tf_{layer}_{tl}"]["norm1"] = _ln(rl.norm1)
                p[f"tf_{layer}_{tl}"]["norm2"] = _ln(rl.norm2)
            p[f"nodevec_linear1_{layer}"] = _d(ref.nodevec_linear1[layer])
            p[f"nodevec_linear2_{layer}"] = _d(ref.nodevec_linear2[layer])
            w = _t(ref.gconv[layer].mlp.mlp.weight)[:, :, 0, 0]  # [out, in]
            p[f"gconv_mlp_{layer}"] = {
                "kernel": w.T, "bias": _t(ref.gconv[layer].mlp.mlp.bias)}

    ours = np.asarray(model.apply({"params": p}, tpp, X, tt, mask))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)


def _attention_layer(al):
    return {"query_projection": _d(al.query_projection),
            "key_projection": _d(al.key_projection),
            "value_projection": _d(al.value_projection),
            "out_projection": _d(al.out_projection)}


def _conv1d_k1(conv):  # Conv1d kernel-size-1 -> Dense
    return {"kernel": _t(conv.weight)[:, :, 0].T, "bias": _t(conv.bias)}


def test_informer_forward_weight_parity():
    """reference models/Informer.py:15-184 FULL forward (not just
    ProbSparse selection). factor=5 at L<=12 makes top-u cover every
    query, so the ProbSparse output is sampling-independent and the whole
    encoder-decoder is deterministic — an exact parity configuration."""
    import jax
    import torch

    B, L, Lp, C = 2, 12, 6, 2
    args = ref_default_args(
        input_len=L, pred_len=Lp, C=C, enc_in=C, c_out=C, batch_size=B,
        d_model=8, d_ff=16, n_heads=2, e_layers=2, d_layers=1, factor=5,
        dropout=0.0, activation="gelu", embed="timeF", freq="h", distil=True,
    )
    with reference_path():
        from models.Informer import Informer as RefInformer

        torch.manual_seed(17)
        ref = RefInformer(args)
        ref.eval()
        tpp, data, tp, mask = _irregular_batch(B, L, Lp, C, seed=15)
        with torch.no_grad():
            ref_out = ref.forecasting(
                torch.tensor(tpp), torch.tensor(data), torch.tensor(tp),
                torch.tensor(mask),
            ).numpy()

        from imm_tsf_tpu.config import Config
        from imm_tsf_tpu.models.informer import Informer

        cfg = Config(model="Informer", input_dim=C, input_len=L, pred_len=Lp,
                     batch_size=B, d_model=8, d_ff=16, n_heads=2, e_layers=2,
                     d_layers=1, factor=5, dropout=0.0, distil=True,
                     activation="gelu")
        model = Informer(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            tpp, data, tp, mask,
        )
        p = jax.tree_util.tree_map(np.asarray, variables["params"])
        bs = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

        for ours_name, ref_emb in (("enc_embedding", ref.enc_embedding),
                                   ("dec_embedding", ref.dec_embedding)):
            p[ours_name]["value_embedding"]["tokenConv"]["kernel"] = _t(
                ref_emb.value_embedding.tokenConv.weight).transpose(2, 1, 0)
        # encoder: AttentionLayer_0/1 = enc attn, 2 = dec self, 3 = dec cross
        for i, el in enumerate(ref.encoder.attn_layers):
            p[f"AttentionLayer_{i}"] = _attention_layer(el.attention)
            p[f"enc_layer_{i}"] = {
                "norm1": _ln(el.norm1), "norm2": _ln(el.norm2),
                "conv1": _conv1d_k1(el.conv1), "conv2": _conv1d_k1(el.conv2),
            }
        for i, cl in enumerate(ref.encoder.conv_layers):
            p[f"conv_layer_{i}"]["downConv"] = {
                "kernel": _t(cl.downConv.weight).transpose(2, 1, 0),
                "bias": _t(cl.downConv.bias)}
            p[f"conv_layer_{i}"]["norm"] = _ln(cl.norm)
            bs[f"conv_layer_{i}"]["norm"] = {
                "mean": _t(cl.norm.running_mean), "var": _t(cl.norm.running_var)}
        p["encoder"]["norm"] = _ln(ref.encoder.norm)
        for i, dl in enumerate(ref.decoder.layers):
            p[f"AttentionLayer_{2 + 2 * i}"] = _attention_layer(dl.self_attention)
            p[f"AttentionLayer_{3 + 2 * i}"] = _attention_layer(dl.cross_attention)
            p[f"dec_layer_{i}"] = {
                "norm1": _ln(dl.norm1), "norm2": _ln(dl.norm2),
                "norm3": _ln(dl.norm3),
                "conv1": _conv1d_k1(dl.conv1), "conv2": _conv1d_k1(dl.conv2),
            }
        p["decoder"]["norm"] = _ln(ref.decoder.norm)
        p["decoder"]["projection"] = _d(ref.decoder.projection)

    ours = np.asarray(model.apply(
        {"params": p, "batch_stats": bs}, tpp, data, tp, mask))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-4)


def _ttm_mixer_block(mb):
    return {"norm": _ln(mb.norm),
            "mlp": {"fc1": _d(mb.mlp.fc1), "fc2": _d(mb.mlp.fc2)},
            "gating_block": {"attn_layer": _d(mb.gating_block.attn_layer)}}


def _ttm_layer(tl):
    out = {"feature_mixer": _ttm_mixer_block(tl.feature_mixer)}
    if hasattr(tl, "patch_mixer"):
        out["patch_mixer"] = _ttm_mixer_block(tl.patch_mixer)
    if hasattr(tl, "channel_feature_mixer"):
        out["channel_feature_mixer"] = _ttm_mixer_block(tl.channel_feature_mixer)
    return out


def test_ttm_forward_weight_parity():
    """reference models/TTM.py:106-301 — adaptive patching (2 AP levels),
    decoder TTMBlock, double normalization, dataset-stride unfold quirk."""
    import jax
    import torch

    B, L, Lp, C = 4, 12, 6, 2
    args = ref_default_args(
        input_len=L, pred_len=Lp, enc_in=C, c_out=C, batch_size=B,
        patch_size=4, stride=2, d_model=16, AP_levels=2, e_layers=1,
        d_layers=1, d_d_model=8, use_decoder=True, mode="mix_channel",
        use_norm=1, dropout=0.0,
    )
    with reference_path():
        from models.TTM import TTM as RefTTM

        torch.manual_seed(5)
        ref = RefTTM(args)
        ref.eval()
        tpp, data, tp, mask = _irregular_batch(B, L, Lp, C, seed=9)
        with torch.no_grad():
            ref_out = ref.forecasting(
                torch.tensor(tpp), torch.tensor(data), torch.tensor(tp),
                torch.tensor(mask),
            ).numpy()

        from imm_tsf_tpu.config import Config
        from imm_tsf_tpu.models.ttm import TTM

        cfg = Config(model="TTM", input_dim=C, input_len=L, pred_len=Lp,
                     batch_size=B, patch_size=4, stride=2, d_model=16,
                     AP_levels=2, e_layers=1, d_layers=1, d_d_model=8,
                     use_decoder=True, mode="mix_channel", use_norm=True,
                     dropout=0.0)
        model = TTM(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            tpp, data, tp, mask,
        )
        p = jax.tree_util.tree_map(np.asarray, variables["params"])

        p["patcher"] = _d(ref.backbone.patcher)
        p["decoder_adapter"] = _d(ref.decoder_adapter)
        p["base_forecast_block"] = _d(ref.head.base_forecast_block)
        for j, ap in enumerate(ref.backbone.encoder.mixers):
            for i, tl in enumerate(ap.mixer_layers):
                p["encoder"][f"ap_block_{j}"][f"mixer_{i}"] = _ttm_layer(tl)
        for i, tl in enumerate(ref.decoder.mixers):
            p["decoder"][f"mixer_{i}"] = _ttm_layer(tl)

    ours = np.asarray(model.apply({"params": p}, tpp, data, tp, mask))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=1e-4, rtol=1e-4)
