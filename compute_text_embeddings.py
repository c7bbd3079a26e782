"""Offline text-embedding precompute (reference compute_text_embeddings.py:8-148).

Per dataset/entity: read text.csv, compute note times relative to the
FIRST NUMERIC timestamp in the DATASET'S time unit, embed every note with the
frozen LLM, save `text_embeddings_model={llm}_layers={n|full}_maxlen={L}.pt`
(torch format for artifact compatibility; .npz fallback without torch).

Divergence from the reference, on purpose: the reference hardcodes rel
times in DAYS (:70-71) while its loader consumes them in the dataset's
time unit (lib/parse_datasets.py:145-147 with the hours/weeks presets of
main.py:790-834) — on any non-days dataset every note collapses into the
first few windows and text-on chunking drops nearly everything. Here rel
times are emitted in the dataset's own unit (``time_unit='auto'`` resolves
it from config.DATASET_PRESETS), so the artifact contract matches what
the loader actually needs on every preset.

TPU redesign (the BASELINE.md north-star stage): the reference embeds ONE
note per LLM forward with max_length padding (:79-83) — here all notes of
an entity go through length-bucketed batched forwards (llm/loader.py
embed_notes), and a tokens/sec counter is reported.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import pandas as pd


def compute_text_embeddings(
    data_name: str,
    llm_model_fusion: str = "GPT2",
    llm_layers_fusion=None,
    max_length: int = 1024,
    data_root: str = "./data",
    model_dir: str | None = None,
    overwrite: bool = False,
    token_batch: int = 64,
    llm_tp: int = 0,
    time_unit: str = "auto",
    unit_scale: float | None = None,
    embed_dtype: str = "float32",
):
    from imm_tsf_tpu.data.dataset import UNIT_SECONDS, embeddings_filename

    if time_unit == "auto":
        from imm_tsf_tpu.config import DATASET_PRESETS

        time_unit = DATASET_PRESETS.get(data_name, {}).get("time_unit", "days")
    if time_unit == "custom":
        if unit_scale is None:
            raise ValueError("Must set unit_scale when time_unit='custom'")
        sec_per_unit = float(unit_scale)
    else:
        sec_per_unit = UNIT_SECONDS[time_unit]
    from imm_tsf_tpu.llm.loader import load_llm, resolve_llm_mesh

    model, params, tokenizer = load_llm(
        llm_model_fusion, llm_layers_fusion, model_dir=model_dir
    )
    # tensor-parallel mesh for the frozen LLM (TPU analog of the reference's
    # device_map="auto", compute_text_embeddings.py:31-37): llm_tp=0 auto-
    # shards Llama/DeepSeek over every visible chip — an 8B-param model
    # does not fit one v5e core (reference README.md:132 mandates >=24GB)
    mesh = resolve_llm_mesh(llm_model_fusion, llm_tp)
    if mesh is not None:
        print(f"[mesh] frozen LLM sharded over {dict(mesh.shape)}")
    # bf16 matmuls on the MXU ~2x the frozen forward and halve its HBM
    # traffic; pooling stays fp32 (llm/loader.py _get_pooled_fwd). Opt-in:
    # the reference embeds in fp32 (load_llm.py loads default dtype), so
    # float32 remains the parity default.
    import jax.numpy as jnp

    compute_dtype = {"float32": None, "bfloat16": jnp.bfloat16}[embed_dtype]
    from imm_tsf_tpu.llm.loader import embed_notes

    proc = os.path.join(data_root, data_name, "processed")
    fname = embeddings_filename(llm_model_fusion, llm_layers_fusion, max_length)
    total_tokens = 0
    embed_secs = 0.0  # device-time only, first (compile-bearing) call excluded
    steady_tokens = 0
    n_calls = 0
    t0 = time.perf_counter()
    for rec in sorted(os.listdir(proc)):
        ent = os.path.join(proc, rec)
        if not os.path.isdir(ent):
            continue
        out_path = os.path.join(ent, fname)
        if os.path.exists(out_path) and not overwrite:  # skip-if-exists (:63-66)
            print(f"[skip] {rec}")
            continue
        text_path = os.path.join(ent, "text.csv")
        ts_path = os.path.join(ent, "time_series.csv")
        if not (os.path.isfile(text_path) and os.path.isfile(ts_path)):
            continue
        tdf = pd.read_csv(text_path, parse_dates=["date_time"]).sort_values("date_time")
        cols = [c for c in tdf.columns if c not in ("date_time", "record_id")]
        ts_base = pd.to_datetime(pd.read_csv(ts_path)["date_time"]).min()
        notes, rel_times = [], []
        for _, row in tdf.iterrows():
            if pd.isna(row[cols[0]]):
                continue
            notes.append(str(row[cols[0]]))
            rel_times.append((row["date_time"] - ts_base).total_seconds() / sec_per_unit)
        if not notes:
            continue
        stats: dict = {}
        te = time.perf_counter()
        emb, _ = embed_notes([notes], model, params, tokenizer,
                             max_length=max_length, token_batch=token_batch,
                             stats_out=stats, mesh=mesh,
                             compute_dtype=compute_dtype)
        te = time.perf_counter() - te
        n_calls += 1
        if n_calls > 1:  # first call pays the bucket-shape compiles
            embed_secs += te
            steady_tokens += stats["real_tokens"]
        emb = emb[0]  # [N, d]
        total_tokens += stats["real_tokens"]
        rel = np.asarray(rel_times, np.float32)
        try:
            import torch

            torch.save({"embeddings": torch.from_numpy(emb),
                        "rel_times": torch.from_numpy(rel),
                        "time_unit": time_unit}, out_path)
        except ImportError:
            np.savez(out_path[:-3] + ".npz", embeddings=emb, rel_times=rel,
                     time_unit=time_unit)
        print(f"[done] {rec}: {len(notes)} notes")
    dt = time.perf_counter() - t0
    if total_tokens:
        # real (non-pad) tokens/sec — the BASELINE.md north-star unit; the
        # reference spends one max_length forward per note regardless
        msg = f"embed throughput: {total_tokens / dt:.0f} tokens/sec (incl. compile)"
        if steady_tokens:
            msg += f"; steady-state: {steady_tokens / embed_secs:.0f} tokens/sec"
        print(msg)
    return total_tokens / dt if total_tokens else 0.0


if __name__ == "__main__":
    from imm_tsf_tpu.utils.compile_cache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="+", default=["EPA-Air"])
    ap.add_argument("--llm_model_fusion", default="GPT2")
    ap.add_argument("--llm_layers_fusion", type=int, default=None)
    ap.add_argument("--max_length", type=int, default=1024)
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--model_dir", default=None)
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--llm_tp", type=int, default=0,
                    help="tensor-parallel width for the frozen LLM "
                         "(0=auto: all chips for Llama/DeepSeek)")
    ap.add_argument("--time_unit", default="auto",
                    help="unit for the stored note rel-times; 'auto' resolves "
                         "each dataset's unit from config.DATASET_PRESETS "
                         "(unknown datasets fall back to days)")
    ap.add_argument("--unit_scale", type=float, default=None,
                    help="seconds per unit when --time_unit=custom")
    ap.add_argument("--embed_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="frozen-LLM forward dtype; bfloat16 ~2x on the MXU "
                         "with fp32 pooling (reference parity = float32)")
    ap.add_argument("--platform", default="auto",
                    help="pin the jax backend platform (e.g. cpu) before "
                         "backend init; auto = default discovery")
    args = ap.parse_args()
    from imm_tsf_tpu.utils.platform import pin_platform

    pin_platform(args.platform)
    for ds in args.datasets:
        compute_text_embeddings(
            ds, args.llm_model_fusion, args.llm_layers_fusion, args.max_length,
            args.data_root, args.model_dir, args.overwrite,
            llm_tp=args.llm_tp, time_unit=args.time_unit,
            unit_scale=args.unit_scale, embed_dtype=args.embed_dtype,
        )
