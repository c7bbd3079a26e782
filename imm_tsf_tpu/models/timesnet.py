"""TimesNet — FFT-period 2-D-variation model, irregular-adapted.

Behavioral parity with reference models/TimesNet.py:9-152: DataEmbedding
over (value, mask, time) channels, predict_linear extension over the time
axis, TimesBlocks with FFT top-k period detection, Inception conv over the
[rows, period] grid, softmax-weighted aggregation, final projection and
de-normalization.

TPU redesign of the data-dependent reshape (SURVEY.md §7 hard part 4):
`period = T // f` drives a dynamic [T//period, period] grid in the
reference. Here the achievable periods {T // f : f in 1..T//2} form a
small static set (~2*sqrt(T) values); EVERY candidate gets a static-shape
branch, all branches run unconditionally in parallel, and the k selected
periods are picked with an exact jnp.take gather over the stacked
branch outputs (a one-hot einsum would bf16-round every element).
Control flow (`lax.switch`) was measured 4.5x slower than computing all
~16 candidates: TPU conditionals serialize, break fusion, and force HBM
materialization per branch, while the branch convs themselves are tiny
(<0.3 GFLOP total) and run fully parallel with static shapes.

Round-3 conv-path optimization (tools/bench_timesnet_decomp.py): the
train step was conv-dispatch bound — ~15 candidate branches x 2
inception convs x 2 layers, each a tiny [B, rows, period, 32] spatial
conv that XLA executes at ~2 TFLOP/s effective. Two EXACT rewrites land
a measured 1.6x step speedup (8.9k -> 14.1k windows/s at the zoo shape):
(1) shape-bucketed canvas batching — candidates are zero-padded into a
small set of common-shape canvases (DP partition minimizing padded
cells x kernel taps + a per-dispatch penalty) and run as one conv per
bucket per inception layer, with the inter-conv activation masked back
to the true grid region so the SAME-pad zero semantics are preserved
exactly; (2) kernel center-cropping — with SAME zero padding, kernel
taps beyond +-(H-1) rows / +-(W-1) cols of a canvas only ever multiply
pad zeros, so the fused 11x11 kernel crops to (2H-1, 2W-1) per canvas
with bit-identical results (up to float re-association inside the conv
reduction).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..layers.embed import DataEmbedding
from .base import pad_time
from .base import torch_linear_kernel_init as _tk


def _init_inception_params(mdl: nn.Module, name: str, c_in: int, c_out: int,
                           num_kernels: int):
    """Explicit conv params so branches can be pure jax functions under
    lax.switch (lifted-transform-free). Matches reference
    layers/Conv_Blocks.py:5-30 (kernel 2i+1, SAME pad, kaiming, zero bias)."""
    params = []
    for i in range(num_kernels):
        k = 2 * i + 1
        w = mdl.param(
            f"{name}_kernel_{i}", nn.initializers.kaiming_normal(), (k, k, c_in, c_out)
        )
        b = mdl.param(f"{name}_bias_{i}", nn.initializers.zeros, (c_out,))
        params.append((w, b))
    return params


def _apply_inception(params, x, crop=False):
    """x [B, H, W, C_in] -> mean over kernel sizes of SAME 2-D convs.

    Fused to ONE conv: with SAME zero padding, the mean of convs with
    kernels 1,3,...,2K-1 equals a single conv whose (2K-1)-sized kernel is
    the mean of the center-embedded kernels (embedded zeros contribute
    nothing at any position, borders included). Exact — validated by the
    TimesNet full-forward weight-parity test — and cheaper: 121 taps vs
    286 summed taps at num_kernels=6, one conv dispatch instead of six
    (the TimesBlock branches are latency-bound small convs).

    With crop=True the fused kernel is additionally center-cropped to
    (2H-1, 2W-1): under SAME zero padding, taps farther than H-1 rows /
    W-1 cols from the center only ever multiply pad zeros, so the crop
    is exact and saves most of the taps on skinny grids (e.g. the
    [2, 72]-canvas bucket runs a 3x11 kernel instead of 11x11)."""
    n = len(params)
    kmax = params[-1][0].shape[0]
    w_comb = jnp.zeros((kmax, kmax) + params[0][0].shape[2:], params[0][0].dtype)
    b_comb = 0.0
    for w, b in params:
        k = w.shape[0]
        o = (kmax - k) // 2
        w_comb = w_comb.at[o:o + k, o:o + k].add(w)
        b_comb = b_comb + b
    if crop:
        H, W = x.shape[1], x.shape[2]
        kh = min(kmax, 2 * H - 1)
        kw = min(kmax, 2 * W - 1)
        oh, ow = (kmax - kh) // 2, (kmax - kw) // 2
        w_comb = w_comb[oh:oh + kh, ow:ow + kw]
    out = jax.lax.conv_general_dilated(
        # conv requires matching operand dtypes (x can be bf16 under
        # compute_dtype="amp_bf16" while a caller-built buffer stays fp32)
        x, (w_comb / n).astype(x.dtype), window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + (b_comb / n).astype(x.dtype)


# per-conv-dispatch penalty (in padded-cell units) for the canvas-bucket
# partition below; 60 measured best on TPU v5e (tools/bench_timesnet_decomp
# FIX sweep: 30/60/100/150/300 -> 60 and 100 pick the same 7-bucket split)
_BUCKET_FIX = 60


def _bucket_partition(T: int, kmax: int):
    """Static DP partition of the candidate periods into canvas buckets.

    Candidates (sorted by grid rows desc) are split into contiguous
    groups; each group shares one zero-padded canvas of shape
    [max rows, max period], so the 2 inception convs run once per group
    instead of once per candidate. Cost per group = padded cells x the
    cropped-kernel tap fraction + _BUCKET_FIX (the measured per-dispatch
    overhead in cell units). Returns (cand, buckets) with buckets =
    [(members: list[(rows, period)], hb, wb)], members in `cand` order
    within each bucket."""
    F = T // 2 + 1
    f_to_period = [T] + [T // f for f in range(1, F)]
    cand = sorted(set(int(p) for p in f_to_period if p >= 1))
    grids = [((T + p - 1) // p, p) for p in cand]
    order = sorted(range(len(cand)), key=lambda i: (-grids[i][0], grids[i][1]))
    n = len(order)
    best = [None] * (n + 1)
    best[0] = (0.0, [])
    for j in range(1, n + 1):
        for i in range(j):
            hb = max(grids[order[t]][0] for t in range(i, j))
            wb = max(grids[order[t]][1] for t in range(i, j))
            taps = (min(kmax, 2 * hb - 1) * min(kmax, 2 * wb - 1)) / (
                kmax * kmax)
            cost = best[i][0] + (j - i) * hb * wb * taps + _BUCKET_FIX
            if best[j] is None or cost < best[j][0]:
                best[j] = (cost, best[i][1] + [(i, j, hb, wb)])
    buckets = [
        ([(order[t], grids[order[t]]) for t in range(i, j)], hb, wb)
        for (i, j, hb, wb) in best[n][1]
    ]
    return cand, buckets


class TimesBlock(nn.Module):
    cfg: Config
    total_len: int  # seq_len + pred_len (static)

    @nn.compact
    def __call__(self, x, train: bool = False):  # [B, T, N]
        cfg = self.cfg
        B, T, N = x.shape
        k = cfg.top_k

        # FFT requires fp32 (upcast under compute_dtype="amp_bf16"; the
        # period stats are selection-only, no gradient path)
        xf = jnp.fft.rfft(x.astype(jnp.float32), axis=1)
        amp = jnp.abs(xf)  # [B, F, N]
        frequency_list = amp.mean(axis=0).mean(axis=-1)  # [F]
        frequency_list = frequency_list.at[0].set(0.0)
        _, top_list = jax.lax.top_k(frequency_list, k)  # [k] dynamic freq idx
        period_weight = amp.mean(axis=-1)[:, top_list]  # [B, k]

        # static candidate periods and f -> branch lookup
        F = T // 2 + 1
        f_to_period = np.array([T] + [T // f for f in range(1, F)], np.int64)
        cand, buckets = _bucket_partition(T, 2 * cfg.num_kernels - 1)
        period_to_branch = {p: i for i, p in enumerate(cand)}
        lookup = jnp.asarray(
            [period_to_branch[int(p)] for p in f_to_period], jnp.int32
        )  # [F]

        conv1_p = _init_inception_params(self, "conv1", cfg.d_model, cfg.d_ff,
                                         cfg.num_kernels)
        conv2_p = _init_inception_params(self, "conv2", cfg.d_ff, cfg.d_model,
                                         cfg.num_kernels)

        # run every candidate branch unconditionally (static shapes, no
        # control flow) with canvas bucketing (see module docstring): each
        # bucket zero-pads its member grids to a common [hb, wb] canvas,
        # stacks them along batch, and runs the two inception convs ONCE;
        # the inter-conv activation is masked back to the true grid region
        # so conv2 sees exactly the SAME-pad zeros the per-branch code
        # would. Then gather the k top-frequency outputs — an exact
        # selection (a one-hot einsum would bf16-round every element at
        # default TPU matmul precision), with no gradient through the
        # indices — identical semantics to a lax.switch per frequency, but
        # 4.5x faster on TPU where conditionals serialize and spill to HBM
        outs = [None] * len(cand)
        for members, hb, wb in buckets:
            canv = []
            needs_mask = any(h != hb or w != wb for _, (h, w) in members)
            mask_np = np.zeros((len(members), 1, hb, wb, 1), np.float32)
            for m, (ci, (h, w)) in enumerate(members):
                length = h * w
                xx = jnp.pad(x, ((0, 0), (0, length - T), (0, 0))) \
                    if length != T else x
                grid = xx.reshape(B, h, w, N)
                canv.append(jnp.pad(
                    grid, ((0, 0), (0, hb - h), (0, wb - w), (0, 0))))
                mask_np[m, 0, :h, :w, 0] = 1.0
            canvas = jnp.concatenate(canv, axis=0)  # [nb*B, hb, wb, N]
            h1 = nn.gelu(_apply_inception(conv1_p, canvas, crop=True))
            if needs_mask:
                h1 = (h1.reshape(len(members), B, hb, wb, -1)
                      * jnp.asarray(mask_np, h1.dtype)
                      ).reshape(-1, hb, wb, h1.shape[-1])
            o = _apply_inception(conv2_p, h1, crop=True)
            for m, (ci, (h, w)) in enumerate(members):
                outs[ci] = o[m * B:(m + 1) * B, :h, :w, :].reshape(
                    B, h * w, N)[:, :T, :]
        outs = jnp.stack(outs)  # [n_cand, B, T, N]
        res = jnp.moveaxis(
            jnp.take(outs, lookup[top_list], axis=0), 0, -1
        )  # [B, T, N, k]

        pw = nn.softmax(period_weight, axis=1)  # [B, k]
        res = (res * pw[:, None, None, :]).sum(axis=-1)
        return res + x


class TimesNet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, tp_to_predict, observed_data, observed_tp, observed_mask,
                 train: bool = False):
        cfg = self.cfg
        seq_len, pred_len, K = cfg.input_len, cfg.pred_len, cfg.input_dim
        observed_data = pad_time(observed_data, seq_len)
        observed_mask = pad_time(observed_mask, seq_len)
        observed_tp = pad_time(observed_tp, seq_len)
        Lp = tp_to_predict.shape[1]
        tp_to_predict = pad_time(tp_to_predict, pred_len)

        x_enc = observed_data
        means = x_enc.mean(axis=1, keepdims=True)
        x_enc = x_enc - means
        stdev = jnp.sqrt(x_enc.var(axis=1, keepdims=True) + 1e-5)
        x_enc = x_enc / stdev
        x_enc = jnp.concatenate(
            [x_enc, observed_mask, observed_tp[:, :, None]], axis=-1
        )  # [B, L, 2K+1]

        enc_out = DataEmbedding(
            cfg.d_model, cfg.freq, cfg.dropout, name="enc_embedding"
        )(x_enc, train=train)  # [B, L, d_model]

        tp_rep = jnp.repeat(tp_to_predict[:, :, None], cfg.d_model, axis=2)
        enc_out = jnp.concatenate([enc_out, tp_rep], axis=1)  # [B, L+Lp, d]
        # predict_linear over the time axis (reference :89-90,131)
        enc_out = nn.Dense(seq_len + pred_len, kernel_init=_tk, name="predict_linear")(
            enc_out.transpose(0, 2, 1)
        ).transpose(0, 2, 1)

        total = seq_len + pred_len
        # ONE shared LayerNorm applied after every TimesBlock (the reference
        # instantiates a single nn.LayerNorm, models/TimesNet.py:88,135 —
        # parameter sharing matters for e_layers > 1; ADVICE r1)
        layer_norm = nn.LayerNorm(epsilon=1e-5, name="layer_norm")
        for i in range(cfg.e_layers):
            enc_out = layer_norm(
                TimesBlock(cfg, total, name=f"times_block_{i}")(enc_out, train=train)
            )

        dec_out = nn.Dense(K, kernel_init=_tk, name="projection")(enc_out)
        dec_out = dec_out * stdev[:, 0, :][:, None, :] + means[:, 0, :][:, None, :]
        dec_out = dec_out[:, -pred_len:, :]
        return dec_out[:, :Lp, :]
