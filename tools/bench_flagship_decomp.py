"""Flagship (PatchTST+fusion) train-step decomposition on TPU.

Times the FULL jitted train step (fwd+bwd+Adam, device-side scan, value
fence — bench.py:bench_jax) with individual components neutralized by
monkeypatch, at the exact bench.py headline shape (B=64, L=48, Lp=24,
C=8, N=8 notes, d_txt=768; PatchTST d_model=512, d_ff=2048, n_heads=2,
e_layers=1; TTF_RecAvg + MMF_GR_Add).

Motivating anomaly (BENCHMARKS.md zoo table): the SAME fusion stack
(~7 GFLOP/step both times) costs ~0.60 ms/step on top of PatchTST
(20,821 -> 17,410 w/s) but only ~0.10 ms on top of DLinear
(54,889 -> 50,577 w/s) — either cross-session measurement drift or a
real scheduling effect worth finding. This tool measures all four cells
in ONE session plus component ablations of both the model and the
fusion stack.

Variants (timing-only surrogates — NOT semantically equivalent):
  full        stock flagship, flax dropout (the decomposition baseline)
  notext      PatchTST alone (fusion off)
  dlin_full   DLinear + the same fusion stack
  dlin_notext DLinear alone
  nodrop      dropout=0.0 everywhere (isolates dropout mask generation —
              rbg hardware RNG — plus the masking elementwise chains)
  nogru       MMF GRU recurrence removed: the batched input projection is
              kept, the 24-step lax.scan over [B,8] hidden states is
              replaced by a parallel elementwise surrogate (isolates the
              sequential-scan latency inside the fusion stack)
  nottf       TTF_RecAvg -> zeros E_txt (isolates the TTF einsum chain +
              LN/dropout/proj; the MMF still runs on the zeros)
  noattn      FullAttention -> values pass-through (q/k/v/out projections
              kept; isolates scores/softmax/attn-dropout)
  noffn       EncoderLayer conv-FFN -> identity (isolates the two big
              d_model x d_ff matmuls, ~2/3 of the model's FLOPs)
  hashdrop    dropout_impl='hash' (layers/fast_dropout.py — the package
              default since round 4; every other variant pins the flax
              impl this decomposition was written against)


Run: python tools/bench_flagship_decomp.py [variant ...]   (default: all)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

if os.environ.get("IMM_TSF_DECOMP_CPU"):  # smoke-test mode (see __main__)
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"

import flax.linen as nn
import jax.numpy as jnp

from bench import bench_jax, build_batch
from imm_tsf_tpu.config import Config

B, L, Lp, C = 64, 48, 24, 8
STEPS = 50
if os.environ.get("IMM_TSF_DECOMP_CPU"):
    # tiny-shape CPU smoke test of every monkeypatch path (timings
    # meaningless); IMM_TSF_DECOMP_CPU=1 python tools/bench_flagship_decomp.py
    B, STEPS = 8, 2
VARIANTS = ("full", "notext", "dlin_full", "dlin_notext", "nodrop",
            "nogru", "nottf", "noattn", "noffn", "hashdrop", "amp",
            "amp_nodrop")


def flagship_cfg(model="PatchTST", enable_text=True, dropout=0.1,
                 dropout_impl="flax"):
    """All ablation variants pin dropout_impl='flax' so the decomposition
    keeps measuring the flax-dropout baseline it was written against (the
    package default moved to 'hash' in round 4 off this tool's findings);
    the `hashdrop` variant measures the current default."""
    kw = {}
    if model == "PatchTST":
        kw = dict(d_model=512, d_ff=2048, n_heads=2, e_layers=1)
    return Config(
        model=model, enable_text=enable_text, use_text_embeddings=True,
        llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
        MMF_module="MMF_GR_Add", d_txt=768, input_dim=C, input_len=L,
        pred_len=Lp, batch_size=B, dropout=dropout,
        dropout_impl=dropout_impl, **kw,
    )


def _patch_nogru():
    """Replace the GRU's sequential lax.scan with a parallel surrogate.

    Keeps the [B,T,3H] batched input projection and all four param
    tensors (w_hh enters through a zero-scaled term so the param tree and
    grad structure are unchanged); drops only the 24-step recurrence."""
    from imm_tsf_tpu.fusion import mmf
    from imm_tsf_tpu.models.base import torch_linear_bias_init

    def _gru_norec(self, x):
        B_, T_, D_in = x.shape
        H = self.hidden_dim
        u = torch_linear_bias_init(H)
        w_ih = self.param("gru_w_ih", u, (D_in, 3 * H))
        b_ih = self.param("gru_b_ih", u, (3 * H,))
        w_hh = self.param("gru_w_hh", u, (H, 3 * H))
        b_hh = self.param("gru_b_hh", u, (3 * H,))
        xi = x @ w_ih + b_ih
        xr, xz, xn = jnp.split(xi, 3, axis=-1)
        zero = 0.0 * (w_hh.sum() + b_hh.sum())
        return jnp.tanh(xn + zero) * nn.sigmoid(xz + xr)

    saved = mmf.MMF_GR_Add._gru
    mmf.MMF_GR_Add._gru = _gru_norec
    return [(mmf.MMF_GR_Add, "_gru", saved)]


def _patch_nottf():
    from imm_tsf_tpu.fusion import ttf

    def _zeros(self, notes_emb, tau, t_hat, notes_mask=None, train=False):
        B_ = notes_emb.shape[0]
        T_ = t_hat.shape[1]
        E = jnp.zeros((B_, T_, self.d_txt), notes_emb.dtype)
        M = jnp.ones((B_, 1), bool)
        return E, M

    saved = ttf.TTF_RecAvg.__call__
    ttf.TTF_RecAvg.__call__ = _zeros
    return [(ttf.TTF_RecAvg, "__call__", saved)]


def _patch_noattn():
    from imm_tsf_tpu.layers import transformer as tr

    def _passthrough(self, queries, keys, values, attn_mask=None, train=False):
        return values

    saved = tr.FullAttention.__call__
    tr.FullAttention.__call__ = _passthrough
    return [(tr.FullAttention, "__call__", saved)]


def _patch_noffn():
    from imm_tsf_tpu.layers import transformer as tr
    _tk = tr._tk

    def _no_ffn(self, x, attn_mask=None, train=False):
        drop = lambda z: nn.Dropout(self.dropout)(z, deterministic=not train)
        new_x = self.attention(x, x, x, attn_mask=attn_mask, train=train)
        x = x + drop(new_x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x)

    _no_ffn.__wrapped__ = None
    saved = tr.EncoderLayer.__call__
    tr.EncoderLayer.__call__ = nn.compact(_no_ffn)
    return [(tr.EncoderLayer, "__call__", saved)]


def run_variant(variant: str) -> tuple[float, float | None]:
    batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    patches = []
    if variant == "full":
        cfg = flagship_cfg()
    elif variant == "notext":
        cfg = flagship_cfg(enable_text=False)
    elif variant == "dlin_full":
        cfg = flagship_cfg(model="DLinear")
    elif variant == "dlin_notext":
        cfg = flagship_cfg(model="DLinear", enable_text=False)
    elif variant == "nodrop":
        cfg = flagship_cfg(dropout=0.0)
    elif variant == "nogru":
        cfg = flagship_cfg()
        patches = _patch_nogru()
    elif variant == "nottf":
        cfg = flagship_cfg()
        patches = _patch_nottf()
    elif variant == "noattn":
        cfg = flagship_cfg()
        patches = _patch_noattn()
    elif variant == "noffn":
        cfg = flagship_cfg()
        patches = _patch_noffn()
    elif variant == "hashdrop":
        cfg = flagship_cfg(dropout_impl="hash")
    elif variant == "amp":
        # hash dropout + amp_bf16 (the two shipped perf modes stacked):
        # backbone forward fully in bf16, fp32 master params/optimizer
        cfg = flagship_cfg(dropout_impl="hash")
        cfg.compute_dtype = "amp_bf16"
    elif variant == "amp_nodrop":
        cfg = flagship_cfg(dropout=0.0)
        cfg.compute_dtype = "amp_bf16"
    else:
        raise SystemExit(f"unknown variant {variant!r}")

    try:
        wps, flops = bench_jax(cfg, batch, steps=STEPS, return_flops=True)
    finally:
        for obj, name, saved in patches:
            setattr(obj, name, saved)
    return wps, flops


def main():
    wanted = sys.argv[1:] or list(VARIANTS)
    rows = {}
    for v in wanted:
        wps, flops = run_variant(v)
        ms = 1e3 * B / wps
        gf = (flops or 0) / 1e9
        rows[v] = (wps, ms, gf)
        print(f"{v:12s}  {wps:10.1f} w/s  {ms:7.3f} ms/step  "
              f"{gf:8.2f} GF/step(XLA)", flush=True)

    if "full" in rows and "notext" in rows:
        d = rows["notext"][1] - 0, rows["full"][1] - rows["notext"][1]
        print(f"\nfusion cost on PatchTST: {d[1]:.3f} ms/step")
    if "dlin_full" in rows and "dlin_notext" in rows:
        d = rows["dlin_full"][1] - rows["dlin_notext"][1]
        print(f"fusion cost on DLinear:  {d:.3f} ms/step")
    for name, base in (("nodrop", "full"), ("nogru", "full"),
                       ("nottf", "full"), ("noattn", "full"),
                       ("noffn", "full")):
        if name in rows and base in rows:
            print(f"{base} - {name}: {rows[base][1] - rows[name][1]:+.3f} "
                  f"ms/step removed")


if __name__ == "__main__":
    main()
