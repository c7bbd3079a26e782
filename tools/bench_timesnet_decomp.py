"""TimesNet step decomposition on TPU (VERDICT r2 item 5).

Times the FULL jitted train step (fwd+bwd+Adam, device-side scan, value
fence — bench.py:bench_jax, the only honest timing on the remote tunnel)
with individual TimesNet components neutralized by monkeypatch, at the
exact BENCHMARKS.md zoo shape (B=64, L=48, Lp=24, C=8; e_layers=2,
d_model=d_ff=32, top_k=5, num_kernels=6 -> 16 candidate periods over
T=72). Reference hot path: models/TimesNet.py:9-65.

Variants:
  base      stock PRODUCTION model (canvas-bucketed + kernel-cropped
            branch convs since round 3)
  prebucket the pre-round-3 TimesBlock (one conv pair per candidate
            branch, full 11x11 kernels) — the historical baseline
  noconv    _apply_inception -> identity (branch convs removed; the 16
            all-candidate pad/reshape/slice branch skeletons remain)
  nobranch  whole candidate-branch stack -> identity (TimesBlock becomes
            FFT + top_k + softmax-weighted residual of x itself)
  fixedsel  jax.lax.top_k on the 1-D frequency list -> static 1..k
            (removes the dynamic branch gather; FFT amplitudes kept)
  nk1       num_kernels=1 (1x1 conv instead of the fused 11x11)
  el1       e_layers=1 (layer scaling)
  bucket    shape-bucketed canvas batching: the ~15 candidate branches are
            zero-padded into ~4 common-shape canvases and run as 4 conv
            dispatches instead of 15 (exact: SAME zero padding means the
            canvas pad region contributes nothing once the inter-conv
            activations are masked back to the true grid)

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
VARIANTS = ("base", "prebucket", "noconv", "nobranch", "fixedsel", "nk1", "el1",
            "crop", "bf16conv", "crop_bf16", "bucket")


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
              lambda params, x, **kw: x + params[0][0].sum() * 1e-30)
    elif variant == "prebucket":
        import flax.linen as nn
        import jax.numpy as jnp
        import numpy as np

        class PreBucketBlock(nn.Module):
            """The pre-round-3 production TimesBlock: one conv pair per
            candidate branch, full (uncropped) fused kernels."""

            cfg: Config
            total_len: int

            @nn.compact
            def __call__(self, x, train: bool = False):
                c = self.cfg
                Bx, T, N = x.shape
                k = c.top_k
                amp = jnp.abs(jnp.fft.rfft(x, axis=1))
                frequency_list = amp.mean(axis=0).mean(axis=-1).at[0].set(0.0)
                _, top_list = jax.lax.top_k(frequency_list, k)
                period_weight = amp.mean(axis=-1)[:, top_list]

                F = T // 2 + 1
                f_to_period = np.array(
                    [T] + [T // f for f in range(1, F)], np.int64)
                cand = sorted(set(int(p) for p in f_to_period if p >= 1))
                lookup = jnp.asarray(
                    [cand.index(int(p)) for p in f_to_period], jnp.int32)

                conv1_p = tn._init_inception_params(
                    self, "conv1", c.d_model, c.d_ff, c.num_kernels)
                conv2_p = tn._init_inception_params(
                    self, "conv2", c.d_ff, c.d_model, c.num_kernels)

                def branch(p):
                    length = ((T + p - 1) // p) * p
                    xx = jnp.pad(x, ((0, 0), (0, length - T), (0, 0))) \
                        if length != T else x
                    grid = xx.reshape(Bx, length // p, p, N)
                    out = tn._apply_inception(
                        conv2_p, nn.gelu(tn._apply_inception(conv1_p, grid)))
                    return out.reshape(Bx, length, N)[:, :T, :]

                outs = jnp.stack([branch(p) for p in cand])
                res = jnp.moveaxis(
                    jnp.take(outs, lookup[top_list], axis=0), 0, -1)
                pw = nn.softmax(period_weight, axis=1)
                return (res * pw[:, None, None, :]).sum(axis=-1) + x

        patch(tn, "TimesBlock", PreBucketBlock)
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

        def apply_inception(params, x, **kw):
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
                # fully-bf16 conv (bf16 out, cast back) — the f32
                # preferred_element_type upcast is not transposable in
                # the conv VJP
                out = jax.lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), w_comb.astype(jnp.bfloat16),
                    (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(x.dtype)
            else:
                out = jax.lax.conv_general_dilated(
                    x, w_comb, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return out + b_comb / n

        patch(tn, "_apply_inception", apply_inception)
    elif variant == "denseweight":
        import flax.linen as nn
        import jax.numpy as jnp
        import numpy as np

        class DenseWeightBlock(nn.Module):
            """Stock branches, but selection = dense weighted sum over ALL
            candidates with a [B, n_cand] weight table (zeros off-top-k)
            instead of jnp.take — backward becomes a dense reduce instead
            of a [n_cand,B,T,N] scatter-add."""

            cfg: Config
            total_len: int

            @nn.compact
            def __call__(self, x, train: bool = False):
                c = self.cfg
                Bx, T, N = x.shape
                k = c.top_k
                amp = jnp.abs(jnp.fft.rfft(x, axis=1))
                frequency_list = amp.mean(axis=0).mean(axis=-1).at[0].set(0.0)
                _, top_list = jax.lax.top_k(frequency_list, k)
                period_weight = amp.mean(axis=-1)[:, top_list]

                F = T // 2 + 1
                f_to_period = np.array(
                    [T] + [T // f for f in range(1, F)], np.int64)
                cand = sorted(set(int(p) for p in f_to_period if p >= 1))
                lookup = jnp.asarray(
                    [cand.index(int(p)) for p in f_to_period], jnp.int32)

                conv1_p = tn._init_inception_params(
                    self, "conv1", c.d_model, c.d_ff, c.num_kernels)
                conv2_p = tn._init_inception_params(
                    self, "conv2", c.d_ff, c.d_model, c.num_kernels)

                def branch(p):
                    length = ((T + p - 1) // p) * p
                    xx = jnp.pad(x, ((0, 0), (0, length - T), (0, 0))) \
                        if length != T else x
                    grid = xx.reshape(Bx, length // p, p, N)
                    out = tn._apply_inception(
                        conv2_p, nn.gelu(tn._apply_inception(conv1_p, grid)))
                    return out.reshape(Bx, length, N)[:, :T, :]

                outs = jnp.stack([branch(p) for p in cand])  # [nc,B,T,N]
                pw = nn.softmax(period_weight, axis=1)  # [B,k]
                # scatter the k weights into the candidate table (tiny)
                wfull = jnp.zeros((Bx, len(cand)), x.dtype)
                wfull = wfull.at[:, lookup[top_list]].add(pw)
                res = (outs * wfull.T[:, :, None, None]).sum(axis=0)
                return res + x

        patch(tn, "TimesBlock", DenseWeightBlock)
    elif variant in ("bucket", "bucket_crop"):
        import flax.linen as nn
        import jax.numpy as jnp
        import numpy as np

        crop_kernels = variant == "bucket_crop"

        class BucketTimesBlock(nn.Module):
            cfg: Config
            total_len: int

            @nn.compact
            def __call__(self, x, train: bool = False):
                c = self.cfg
                Bx, T, N = x.shape
                k = c.top_k
                amp = jnp.abs(jnp.fft.rfft(x, axis=1))
                frequency_list = amp.mean(axis=0).mean(axis=-1).at[0].set(0.0)
                _, top_list = jax.lax.top_k(frequency_list, k)
                period_weight = amp.mean(axis=-1)[:, top_list]

                F = T // 2 + 1
                f_to_period = np.array(
                    [T] + [T // f for f in range(1, F)], np.int64)
                cand = sorted(set(int(p) for p in f_to_period if p >= 1))
                lookup = jnp.asarray(
                    [cand.index(int(p)) for p in f_to_period], jnp.int32)

                conv1_p = tn._init_inception_params(
                    self, "conv1", c.d_model, c.d_ff, c.num_kernels)
                conv2_p = tn._init_inception_params(
                    self, "conv2", c.d_ff, c.d_model, c.num_kernels)

                # grids per candidate; DP partition (by rows desc) into
                # canvas buckets minimizing padded cells + per-dispatch cost
                grids = [((T + p - 1) // p, p) for p in cand]
                order = sorted(range(len(cand)),
                               key=lambda i: (-grids[i][0], grids[i][1]))
                n = len(order)
                FIX = int(__import__("os").environ.get("TN_BUCKET_FIX", "150"))
                best = [None] * (n + 1)
                best[0] = (0.0, [])
                for j in range(1, n + 1):
                    for i in range(j):
                        hb = max(grids[order[t]][0] for t in range(i, j))
                        wb = max(grids[order[t]][1] for t in range(i, j))
                        taps = 1.0
                        if crop_kernels:
                            taps = (min(11, 2 * hb - 1) *
                                    min(11, 2 * wb - 1)) / 121.0
                        cost = best[i][0] + (j - i) * hb * wb * taps + FIX
                        if best[j] is None or cost < best[j][0]:
                            best[j] = (cost, best[i][1] + [(i, j, hb, wb)])
                buckets = best[n][1]

                def apply_crop(params, xx):
                    # mean-of-kernels fused to one conv, then center-cropped
                    # to (2H-1, 2W-1): taps beyond that only ever multiply
                    # SAME-pad zeros, so the crop is exact
                    nk = len(params)
                    kmax = params[-1][0].shape[0]
                    w_comb = jnp.zeros(
                        (kmax, kmax) + params[0][0].shape[2:],
                        params[0][0].dtype)
                    b_comb = 0.0
                    for w, b in params:
                        kk = w.shape[0]
                        o = (kmax - kk) // 2
                        w_comb = w_comb.at[o:o + kk, o:o + kk].add(w)
                        b_comb = b_comb + b
                    H, W = xx.shape[1], xx.shape[2]
                    kh = min(kmax, 2 * H - 1)
                    kw = min(kmax, 2 * W - 1)
                    oh, ow = (kmax - kh) // 2, (kmax - kw) // 2
                    out = jax.lax.conv_general_dilated(
                        xx, w_comb[oh:oh + kh, ow:ow + kw] / nk, (1, 1),
                        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return out + b_comb / nk

                apply = apply_crop if crop_kernels else tn._apply_inception

                outs = [None] * len(cand)
                for (i, j, hb, wb) in buckets:
                    members = [order[t] for t in range(i, j)]
                    canv, mask = [], np.zeros((len(members), 1, hb, wb, 1),
                                              np.float32)
                    for m, ci in enumerate(members):
                        h, w = grids[ci]
                        length = h * w
                        xx = jnp.pad(x, ((0, 0), (0, length - T), (0, 0)))
                        g = xx.reshape(Bx, h, w, N)
                        canv.append(jnp.pad(
                            g, ((0, 0), (0, hb - h), (0, wb - w), (0, 0))))
                        mask[m, 0, :h, :w, 0] = 1.0
                    canvas = jnp.concatenate(canv, axis=0)
                    h1 = apply(conv1_p, canvas)
                    h1 = nn.gelu(h1).reshape(len(members), Bx, hb, wb, N)
                    h1 = (h1 * jnp.asarray(mask)).reshape(-1, hb, wb, N)
                    o = apply(conv2_p, h1)
                    for m, ci in enumerate(members):
                        h, w = grids[ci]
                        outs[ci] = o[m * Bx:(m + 1) * Bx, :h, :w, :].reshape(
                            Bx, h * w, N)[:, :T, :]

                res = jnp.moveaxis(
                    jnp.take(jnp.stack(outs), lookup[top_list], axis=0), 0, -1)
                pw = nn.softmax(period_weight, axis=1)
                return (res * pw[:, None, None, :]).sum(axis=-1) + x

        patch(tn, "TimesBlock", BucketTimesBlock)
    elif variant == "cpack":
        import flax.linen as nn
        import jax.numpy as jnp
        import numpy as np

        class CPackTimesBlock(nn.Module):
            """Shape-bucketed branches packed along the CHANNEL axis
            (nb*32 lanes vs 32) with shared-weight block-diagonal (kron)
            kernels — one conv dispatch per bucket per inception layer."""

            cfg: Config
            total_len: int

            @nn.compact
            def __call__(self, x, train: bool = False):
                c = self.cfg
                Bx, T, N = x.shape
                k = c.top_k
                amp = jnp.abs(jnp.fft.rfft(x, axis=1))
                frequency_list = amp.mean(axis=0).mean(axis=-1).at[0].set(0.0)
                _, top_list = jax.lax.top_k(frequency_list, k)
                period_weight = amp.mean(axis=-1)[:, top_list]

                F = T // 2 + 1
                f_to_period = np.array(
                    [T] + [T // f for f in range(1, F)], np.int64)
                cand = sorted(set(int(p) for p in f_to_period if p >= 1))
                lookup = jnp.asarray(
                    [cand.index(int(p)) for p in f_to_period], jnp.int32)

                conv1_p = tn._init_inception_params(
                    self, "conv1", c.d_model, c.d_ff, c.num_kernels)
                conv2_p = tn._init_inception_params(
                    self, "conv2", c.d_ff, c.d_model, c.num_kernels)

                def comb(params):
                    n = len(params)
                    kmax = params[-1][0].shape[0]
                    w_comb = jnp.zeros(
                        (kmax, kmax) + params[0][0].shape[2:],
                        params[0][0].dtype)
                    b_comb = 0.0
                    for w, b in params:
                        kk = w.shape[0]
                        o = (kmax - kk) // 2
                        w_comb = w_comb.at[o:o + kk, o:o + kk].add(w)
                        b_comb = b_comb + b
                    return w_comb / n, b_comb / n

                w1, b1 = comb(conv1_p)
                w2, b2 = comb(conv2_p)
                KSZ = w1.shape[0]

                def blockdiag(w, nb):
                    ci, co = w.shape[2], w.shape[3]
                    wb = jnp.zeros((KSZ, KSZ, nb, ci, nb, co), w.dtype)
                    for i in range(nb):
                        wb = wb.at[:, :, i, :, i, :].set(w)
                    return wb.reshape(KSZ, KSZ, nb * ci, nb * co)

                grids = [((T + p - 1) // p, p) for p in cand]
                order = sorted(range(len(cand)),
                               key=lambda i: (-grids[i][0], grids[i][1]))
                n = len(order)
                FIX = int(__import__("os").environ.get("TN_BUCKET_FIX", "150"))
                best = [None] * (n + 1)
                best[0] = (0.0, [])
                for j in range(1, n + 1):
                    for i in range(j):
                        hb = max(grids[order[t]][0] for t in range(i, j))
                        wb = max(grids[order[t]][1] for t in range(i, j))
                        cost = best[i][0] + (j - i) * hb * wb + FIX
                        if best[j] is None or cost < best[j][0]:
                            best[j] = (cost, best[i][1] + [(i, j, hb, wb)])
                buckets = best[n][1]

                outs = [None] * len(cand)
                for (i, j, hb, wb) in buckets:
                    members = [order[t] for t in range(i, j)]
                    nb = len(members)
                    canv = []
                    mask = np.zeros((1, hb, wb, nb, 1), np.float32)
                    for m, ci in enumerate(members):
                        h, w = grids[ci]
                        length = h * w
                        xx = jnp.pad(x, ((0, 0), (0, length - T), (0, 0)))
                        g = xx.reshape(Bx, h, w, N)
                        canv.append(jnp.pad(
                            g, ((0, 0), (0, hb - h), (0, wb - w), (0, 0))))
                        mask[0, :h, :w, m, 0] = 1.0
                    canvas = jnp.concatenate(canv, axis=-1)  # [B,hb,wb,nb*N]
                    mask = jnp.asarray(mask.reshape(1, hb, wb, nb))
                    mask = jnp.repeat(mask, N, axis=-1).reshape(
                        1, hb, wb, nb * N)
                    h1 = jax.lax.conv_general_dilated(
                        canvas, blockdiag(w1, nb), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")
                    ) + jnp.tile(b1, nb)
                    h1 = nn.gelu(h1) * mask
                    o = jax.lax.conv_general_dilated(
                        h1, blockdiag(w2, nb), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC")
                    ) + jnp.tile(b2, nb)
                    for m, ci in enumerate(members):
                        h, w = grids[ci]
                        outs[ci] = o[:, :h, :w, m * N:(m + 1) * N].reshape(
                            Bx, h * w, N)[:, :T, :]

                res = jnp.moveaxis(
                    jnp.take(jnp.stack(outs), lookup[top_list], axis=0), 0, -1)
                pw = nn.softmax(period_weight, axis=1)
                return (res * pw[:, None, None, :]).sum(axis=-1) + x

        patch(tn, "TimesBlock", CPackTimesBlock)
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
