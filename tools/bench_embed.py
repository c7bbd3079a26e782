"""Embed-stage benchmark: tokens/sec (the second BASELINE.md north-star).

Measures the batched, length-bucketed frozen-GPT2 note-embedding stage
(imm_tsf_tpu/llm/loader.py:embed_notes) on the available accelerator and
compares against the reference's hot loop: ONE note per torch forward,
every note padded to max_length (reference compute_text_embeddings.py:79-83
+ fusions/load_llm.py:160-166), on CPU.

Both sides count REAL (non-pad) tokens, so the speedup reflects both
batching and the padding waste the reference pays.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imm_tsf_jax_cache")

MAX_LENGTH = 1024
WORDS = ["alpha", "beta", "gamma", "delta", "metric", "sensor", "patient",
         "reading", "anomaly", "stable", "rising", "falling", "normal"]


def synth_notes(n_notes: int, seed: int = 0) -> list[str]:
    """Realistic length mix: mostly short notes, a long tail (lognormal)."""
    rng = np.random.default_rng(seed)
    lens = np.clip(rng.lognormal(3.4, 1.0, n_notes).astype(int), 3, 900)
    return [" ".join(rng.choice(WORDS, k)) for k in lens]


def bench_jax_embed(notes: list[str], token_batch: int = 64,
                    compute_dtype=None, use_fused_attn: bool = False):
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from imm_tsf_tpu.llm.loader import embed_notes, load_llm

    model, params, tokenizer = load_llm(
        "GPT2", use_fused_attn=use_fused_attn)  # 12-layer GPT-2 FLOPs
    # warmup: compile every bucket shape once
    stats: dict = {}
    embed_notes([notes], model, params, tokenizer, max_length=MAX_LENGTH,
                token_batch=token_batch, stats_out=stats,
                compute_dtype=compute_dtype)
    t0 = time.perf_counter()
    stats = {}
    emb, _ = embed_notes([notes], model, params, tokenizer,
                         max_length=MAX_LENGTH, token_batch=token_batch,
                         stats_out=stats, compute_dtype=compute_dtype)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(emb, np.float32)).all()
    return stats["real_tokens"] / dt, stats


def bench_torch_reference(notes: list[str]):
    """The reference hot loop: per-note max_length forward, CPU torch GPT-2
    (random weights — identical FLOPs to pretrained)."""
    try:
        import torch
        from transformers import GPT2Config, GPT2Model

        model = GPT2Model(GPT2Config())  # 12 layers, d=768 — GPT-2 small
        model.eval()

        # reference tokenization contract: pad every note to max_length
        from imm_tsf_tpu.llm.loader import HashTokenizer

        tok = HashTokenizer(50257)
        ids, mask = tok(notes, max_length=MAX_LENGTH)
        real_tokens = int(mask.sum())

        with torch.no_grad():
            # warmup
            model(input_ids=torch.tensor(ids[:1]),
                  attention_mask=torch.tensor(mask[:1]))
            t0 = time.perf_counter()
            for i in range(len(notes)):  # ONE NOTE PER FORWARD (:79-83)
                out = model(input_ids=torch.tensor(ids[i : i + 1]),
                            attention_mask=torch.tensor(mask[i : i + 1]))
                h = out.last_hidden_state
                m = torch.tensor(mask[i : i + 1]).unsqueeze(-1).float()
                _ = (h * m).sum(1) / m.sum(1).clamp(min=1e-6)
            dt = time.perf_counter() - t0
        return real_tokens / dt
    except Exception as e:
        print(f"# reference embed baseline unavailable: {e}", file=sys.stderr)
        return None


def main():
    import jax.numpy as jnp

    # 4096 notes (~196k real tokens): big enough that per-dispatch latency
    # on the remote chip amortizes — the 512-note size used through round 3
    # was ~25k tokens (~0.4s), mostly dispatch+fetch latency.
    notes = synth_notes(4096, seed=0)
    ours, stats = bench_jax_embed(notes)
    bf16, _ = bench_jax_embed(notes, compute_dtype=jnp.bfloat16)
    # fused-attention A/B (ops/pallas/attn_kernel.py): long-bucket note
    # batches are where attention IS bandwidth-bound ([B,H,T,T] scores
    # at T=512+ dwarf the MXU time, unlike TimeLLM's short prompts)
    try:
        fused, _ = bench_jax_embed(notes, use_fused_attn=True)
        fused_bf16, _ = bench_jax_embed(notes, compute_dtype=jnp.bfloat16,
                                        use_fused_attn=True)
    except Exception as e:  # noqa: BLE001 — a fused-arm failure must not
        print(f"# fused-attn arm failed: {type(e).__name__}: {e}",
              file=sys.stderr)  # discard the already-measured baselines
        fused = fused_bf16 = None
    # baseline on a subset (CPU forwards are ~1s each), same length mix
    ref = bench_torch_reference(notes[:16])
    vs = ours / ref if ref else None
    print(json.dumps({
        "metric": "embed_tokens_per_sec",
        "value": round(ours, 1),
        "unit": "tokens/s",
        "vs_baseline": round(vs, 2) if ref else None,
        "value_bf16": round(bf16, 1),
        "value_fused_attn": round(fused, 1) if fused else None,
        "value_fused_attn_bf16": round(fused_bf16, 1) if fused_bf16 else None,
        "fused_attn_speedup":
            round(fused / ours, 3) if (fused and ours) else None,
        "fused_attn_bf16_speedup":
            round(fused_bf16 / bf16, 3) if (fused_bf16 and bf16) else None,
    }))
    print(f"# {stats['n_notes']} notes, {stats['real_tokens']} real tokens, "
          f"{stats['processed_tokens']} processed (bucketed); "
          f"reference CPU: {ref:.1f} tokens/s" if ref else "", file=sys.stderr)


if __name__ == "__main__":
    main()
