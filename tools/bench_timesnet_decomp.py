"""TimesNet step decomposition on TPU (VERDICT r2 item 5).

Times the FULL jitted train step (fwd+bwd+Adam, device-side scan, value
fence — bench.py:bench_jax, the only honest timing on the remote tunnel)
with individual TimesNet components neutralized by monkeypatch, at the
exact BENCHMARKS.md zoo shape (B=64, L=48, Lp=24, C=8; e_layers=2,
d_model=d_ff=32, top_k=5, num_kernels=6 -> 16 candidate periods over
T=72). Reference hot path: models/TimesNet.py:9-65.

Variants:
  base      stock model (BENCHMARKS.md row)
  noconv    _apply_inception -> identity (branch convs removed; the 16
            all-candidate pad/reshape/slice branch skeletons remain)
  nobranch  whole candidate-branch stack -> identity (TimesBlock becomes
            FFT + top_k + softmax-weighted residual of x itself)
  fixedsel  jax.lax.top_k on the 1-D frequency list -> static 1..k
            (removes the dynamic branch gather; FFT amplitudes kept)
  nk1       num_kernels=1 (1x1 conv instead of the fused 11x11)
  el1       e_layers=1 (layer scaling)

Run: python tools/bench_timesnet_decomp.py [variant ...]  (default: all)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax

from bench import bench_jax, build_batch
from imm_tsf_tpu.config import MODEL_PRESETS, Config
import imm_tsf_tpu.models.timesnet as tn

B, L, Lp, C = 64, 48, 24, 8
VARIANTS = ("base", "noconv", "nobranch", "fixedsel", "nk1", "el1",
            "crop", "bf16conv", "crop_bf16")


def run_variant(variant: str) -> float:
    batch = build_batch(B=B, L=L, Lp=Lp, C=C)
    kw = dict(MODEL_PRESETS["TimesNet"], d_model=32, d_ff=32)
    if variant == "nk1":
        kw["num_kernels"] = 1
    if variant == "el1":
        kw["e_layers"] = 1
    cfg = Config(model="TimesNet", input_dim=C, input_len=L, pred_len=Lp,
                 batch_size=B, **kw)

    saved = {}

    def patch(obj, name, fn):
        saved[(obj, name)] = getattr(obj, name)
        setattr(obj, name, fn)

    if variant == "noconv":
        # identity inception (d_model == d_ff at this shape); keeps the
        # params alive in the graph so init/Adam shapes are unchanged
        patch(tn, "_apply_inception",
              lambda params, x: x + params[0][0].sum() * 1e-30)
    elif variant == "nobranch":
        # whole candidate stack (pad/reshape/conv/slice x16 + gather) gone:
        # TimesBlock reduced to FFT + top_k + softmax-weighted residual
        import flax.linen as nn
        import jax.numpy as jnp

        class NoBranchBlock(nn.Module):
            cfg: Config
            total_len: int

            @nn.compact
            def __call__(self, x, train: bool = False):
                k = self.cfg.top_k
                amp = jnp.abs(jnp.fft.rfft(x, axis=1))
                frequency_list = amp.mean(axis=0).mean(axis=-1).at[0].set(0.0)
                _, top_list = jax.lax.top_k(frequency_list, k)
                pw = nn.softmax(amp.mean(axis=-1)[:, top_list], axis=1)
                return (x[..., None] * pw[:, None, None, :]).sum(axis=-1) + x

        patch(tn, "TimesBlock", NoBranchBlock)
    elif variant in ("crop", "bf16conv", "crop_bf16"):
        import jax.numpy as jnp

        def apply_inception(params, x):
            n = len(params)
            kmax = params[-1][0].shape[0]
            w_comb = jnp.zeros((kmax, kmax) + params[0][0].shape[2:],
                               params[0][0].dtype)
            b_comb = 0.0
            for w, b in params:
                kk = w.shape[0]
                o = (kmax - kk) // 2
                w_comb = w_comb.at[o:o + kk, o:o + kk].add(w)
                b_comb = b_comb + b
            w_comb = w_comb / n
            if variant in ("crop", "crop_bf16"):
                # EXACT: with SAME zero padding, kernel rows beyond
                # +-(H-1) / cols beyond +-(W-1) only ever multiply pad
                # zeros, so center-cropping to (2H-1, 2W-1) is identity
                H, W = x.shape[1], x.shape[2]
                kh = min(kmax, 2 * H - 1)
                kw = min(kmax, 2 * W - 1)
                oh, ow = (kmax - kh) // 2, (kmax - kw) // 2
                w_comb = w_comb[oh:oh + kh, ow:ow + kw]
            if variant in ("bf16conv", "crop_bf16"):
                out = jax.lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), w_comb.astype(jnp.bfloat16),
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
            else:
                out = jax.lax.conv_general_dilated(
                    x, w_comb, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + b_comb / n

        patch(tn, "_apply_inception", apply_inception)
    elif variant == "fixedsel":
        import jax.numpy as jnp

        orig_topk = jax.lax.top_k

        def fake_topk(x, k):
            if x.ndim == 1:  # the frequency-list call inside TimesBlock
                idx = jnp.arange(1, k + 1, dtype=jnp.int32)
                return x[idx], idx
            return orig_topk(x, k)

        patch(jax.lax, "top_k", fake_topk)

    try:
        wps, flops = bench_jax(cfg, batch, steps=30, return_flops=True)
    finally:
        for (obj, name), fn in saved.items():
            setattr(obj, name, fn)
    g = (flops or 0.0) / 1e9
    print(f"{variant:9s} {wps:9.1f} windows/s   {B / wps * 1e3:6.2f} ms/step   "
          f"{g:6.2f} GFLOP/step", flush=True)
    return wps


def main():
    todo = sys.argv[1:] or VARIANTS
    print(f"platform={jax.devices()[0].platform} shape B={B} L={L} Lp={Lp} C={C}")
    for v in todo:
        run_variant(v)


if __name__ == "__main__":
    main()
