"""Configuration system for imm-tsf-tpu.

TPU-native re-design of the reference's three-tier config stack
(reference: main.py:43-759 argparse flags; main.py:762-942 overlays):

  tier 1: `Config` dataclass defaults       (== argparse defaults)
  tier 2: fixed_params / tunable_params dict overlays (main.py:762-786)
  tier 3: per-dataset presets (main.py:788-836) and per-model presets
          (main.py:839-923), applied in that order when overwrite=True.

Unlike the reference we use one typed dataclass instead of an argparse
namespace so configs are hashable/serializable and safe to close over in
jitted code.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


_COMPUTE_DTYPES = ("float32", "bfloat16", "highest", "amp_bf16")
_FROZEN_PARAM_DTYPES = ("float32", "bfloat16")
_DROPOUT_IMPLS = ("hash", "flax")  # layers/fast_dropout.py:_IMPLS


@dataclass
class Config:
    # --- general (main.py:47-66) ---
    overwrite_args: bool = False
    # reference --gpu N selects the CUDA device (main.py:62,752); here it
    # selects the Nth visible accelerator chip (go.sh passes it through)
    gpu: int = 0
    # jax backend platform: "auto" (default discovery order), or an explicit
    # platform name ("cpu", "tpu", ...) pinned BEFORE backend init. "cpu"
    # keeps every driver usable when the accelerator/tunnel is down — env
    # vars alone don't suffice where a sitecustomize force-registers a
    # remote platform via config.update (which outranks env).
    platform: str = "auto"
    state: str = "def"  # "def" | "debug"
    seed: int = 1
    dataset: str = "FNSPID"
    data_root: str = "./data"
    n: int = int(1e8)  # max dataset size
    split_method: str = "sample"  # "instance" | "sample"
    enable_text: bool = False
    use_text_embeddings: bool = True

    # --- windowing (main.py:118-146) ---
    time_unit: str = "days"
    unit_scale: float | None = None
    history: int = 24
    pred_window: int = 24
    stride: int = 24

    # --- patching (tPatchGNN; main.py:126-146, derived main.py:748-750) ---
    patch_size: int = 24
    npatch: int | None = None
    patch_stride: int | None = None

    # --- model selection ---
    model: str = "tPatchGNN"

    # --- tPatchGNN (main.py:153-172) ---
    outlayer: str = "Linear"
    hid_dim: int = 64
    te_dim: int = 10
    node_dim: int = 10
    hop: int = 1
    tf_layer: int = 1
    nlayer: int = 1

    # --- TSLib-family shared hparams (main.py:173-237) ---
    top_k: int = 5
    e_layers: int = 2
    d_layers: int = 1
    d_ff: int = 2048
    d_model: int = 512
    n_heads: int = 2
    num_kernels: int = 6
    embed: str = "timeF"
    freq: str = "h"
    moving_avg: int = 25
    factor: int = 1
    activation: str = "gelu"
    distil: bool = True
    down_sampling_layers: int = 3
    down_sampling_window: int = 2
    down_sampling_method: str = "avg"
    decomp_method: str = "moving_avg"
    channel_independence: int = 1
    use_norm: int = 1
    n_vars: int = 7

    # --- TTM (main.py:239-258) ---
    mode: str = "mix_channel"
    AP_levels: int = 3
    use_decoder: bool = True
    d_mode: str = "common_channel"
    d_d_model: int = 64

    # --- TimeLLM (main.py:260-292) ---
    ts_vocab_size: int = 1000
    domain_des: str = (
        "The Electricity Transformer Temperature (ETT) is a crucial indicator "
        "in the electric power long-term deployment."
    )
    input_token_len: int = 576
    output_token_len: int = 96
    llm_model_timellm: str = "GPT2"
    llm_layers_timellm: int = 6
    # reference-exact TimeLLM prompt: per-batch stats rendered to text and
    # tokenized ON HOST (models/TimeLLM.py:168-195), fed as a static-length
    # int32 prompt_ids input. False = learned pseudo-token fast path.
    timellm_exact_prompt: bool = False
    timellm_prompt_len: int = 128  # static tokenized-prompt length

    # --- NeuralFlow (main.py:295-441) ---
    nf_latents: int = 20
    nf_rec_dims: int = 40
    nf_gru_units: int = 32
    nf_hidden_layers: int = 3
    nf_hidden_dim: int = 32
    nf_flow_model: str = "coupling"  # "coupling" | "resnet"
    nf_flow_layers: int = 2
    nf_time_net: str = "TimeLinear"
    nf_time_hidden_dim: int = 8
    nf_solver: str = "dopri5"
    nf_solver_step: float = 0.05
    nf_atol: float = 1e-4
    nf_rtol: float = 1e-3
    nf_odenet: str = "concat"
    nf_activation: str = "Tanh"
    nf_final_activation: str = "Identity"
    nf_obsrv_std: float = 0.01
    nf_weight_decay: float = 1e-4
    nf_quantization: float = 0.0
    nf_max_t: float = 5.0
    nf_mixing: float = 1e-4
    nf_gob_prep_hidden: int = 10
    nf_gob_cov_hidden: int = 50
    nf_gob_p_hidden: int = 25
    nf_invertible: int = 1
    nf_components: int = 8
    nf_decoder_type: str = "continuous"
    nf_rnn: str = "gru"
    nf_marks: int = 0
    nf_density_model: str = "independent"
    nf_extrap: int = 0

    # --- CRU (main.py:443-524) ---
    cru_lsd: int | None = None  # latent state dim (defaults to hid_dim)
    cru_hidden_units: int | None = None
    cru_enc_num_layers: int = 1
    cru_dec_num_layers: int = 1
    cru_num_layers: int = 1
    cru_dropout_type: str = "None"
    cru_dropout_rate: float = 0.0
    cru_enc_var_activation: str = "square"
    cru_dec_var_activation: str = "exp"
    # defaults below mirror models/CRU.py:17-53 CRU_Args_Internal getattrs
    cru_trans_net_hidden_units: tuple = ()
    cru_trans_net_hidden_activation: str = "elup1"
    cru_trans_var_activation: str = "elup1"
    cru_trans_covar: float = 0.1
    cru_initial_state_variance: float = 10.0
    cru_num_basis: int = 15
    cru_bandwidth: int = 3
    cru_t_sensitive_trans_net: bool = False
    cru_f_cru: bool = False
    cru_rkn: bool = False
    cru_orthogonal: bool = True
    ts: float = 0.3  # timestamp scaling factor
    grad_clip: bool = False

    # --- LatentODE (main.py:530-611) ---
    ode_latents: int = 20
    ode_units: int = 32
    ode_gen_layers: int = 1
    ode_rec_dims: int = 32
    ode_rec_layers: int = 1
    ode_gru_units: int = 32
    ode_poisson: bool = False
    ode_classif: bool = False
    ode_linear_classif: bool = False
    ode_z0_encoder: str = "odernn"
    ode_obsrv_std: float = 0.01
    ode_n_traj_samples: int = 1
    # reference eval protocol for LatentODE/NeuralFlow: SAMPLE z0 (n_traj=1)
    # at eval instead of the posterior mean (fixed key -> deterministic).
    # Measured shift on the parity fixture: LatentODE 0.08%, NeuralFlow
    # ~3% MSE (PARITY.md eval-semantics table)
    eval_sample_traj: bool = False
    # TPU-only: static rk4 substeps per ODE-RNN encoder interval, replacing
    # the reference's data-dependent sub-grid (encoder_decoder.py:287-291)
    ode_substeps: int = 4

    # --- fusion (main.py:612-676) ---
    TTF_module: str = "TTF_T2V_XAttn"
    MMF_module: str = "MMF_XAttn_Add"
    llm_model_fusion: str = "GPT2"
    llm_layers_fusion: int | None = 6
    max_length: int = 1024
    d_txt: int = 768
    recency_sigma: float = 1.0
    n_heads_fusion: int = 1
    kappa: float = 0.5
    # tensor-parallel width for the frozen fusion LLM: weights sharded over
    # a ('data','model') mesh per their partition specs (TPU analog of the
    # reference's device_map="auto", fusions/load_llm.py:102-107; mandatory
    # for Llama/DeepSeek-scale models that don't fit one chip). 1 = single
    # chip; 0 = auto (all visible devices on 'model' for Llama/DeepSeek)
    llm_tp: int = 1

    # --- training (main.py:678-729) ---
    epoch: int = 1000
    patience: int = 3
    early_stop_delta: float = 1e-4
    lr: float = 1e-3
    w_decay: float = 0.01
    batch_size: int = 32
    dropout: float = 0.1
    use_amp: bool = False  # on TPU: bfloat16 compute path
    logmode: str = "a"
    save: str = "experiments/"
    load: str | None = None

    # --- TPU-native additions (no reference analog) ---
    # training PRNG implementation: 'rbg' uses the TPU hardware RNG for
    # dropout masks — threefry mask generation measured at 42% of a
    # PatchTST train step; 'threefry2x32' restores jax's default
    rng_impl: str = "rbg"
    # dropout mask implementation (layers/fast_dropout.py): 'hash' fuses
    # mask generation into the elementwise chains via an inline integer
    # hash (no rng tensor through HBM, no stored mask residual; measured
    # 1.20x on the flagship train step, vmap-stable); 'flax' restores
    # flax nn.Dropout bit-for-bit. Both are Bernoulli(1-dropout) inverted
    # dropout — the streams differ like a seed change.
    dropout_impl: str = "hash"
    # shuffle-stream seed override (None = cfg.seed). Lets N seed-variant
    # experiments share one data order so they can train STACKED in one
    # vmapped program (training/vmap_sweep.py) — the sweep-throughput axis
    data_seed: int | None = None
    # train N init/dropout seed replicas per chip in ONE vmapped program
    # (cfg.seed, cfg.seed+1, ...); main.py prints per-seed results
    vmap_seeds: int = 1
    # learning-rate grid stacked onto the same vmapped program (each of the
    # vmap_seeds replicas trains once per lr; per-replica lr rides in the
    # vmapped opt_state) — e.g. --vmap_lrs 1e-3 5e-4 1e-4
    vmap_lrs: tuple = ()
    mesh_shape: tuple = ()  # e.g. (8,) for 8-way data parallel; () = single chip
    mesh_axis_names: tuple = ("data",)
    # matmul precision: "float32" (TPU default — fp32 operands already run
    # as single-pass bf16 on the MXU, the free AMP analog; verified
    # bit-identical trained metrics to "bfloat16") | "bfloat16" (pin
    # explicitly) | "highest" (true multi-pass fp32 matmuls) |
    # "amp_bf16" (true mixed precision: fp32 master params + optimizer,
    # BACKBONE forward fully in bf16 — params/inputs cast at use, halving
    # activation HBM traffic; fusion stack and loss stay fp32)
    compute_dtype: str = "float32"
    # storage dtype for FROZEN param subtrees (the no-update LLM backbone,
    # optim.py FROZEN_SUBTREE): "bfloat16" halves their HBM reads per step
    # at zero optimizer risk (they take no updates and their wgrads are
    # already stop_gradient-dropped); activations stay fp32 via dtype
    # promotion (fp32 x bf16 matmul -> fp32). Reference trains the frozen
    # backbone in fp32 (models/TimeLLM.py:128-159), hence the default.
    frozen_param_dtype: str = "float32"
    host_prefetch: int = 2  # double-buffered host->device pipeline depth
    use_pallas: bool = True  # use fused Pallas kernels where profitable
    # sub-flag of use_pallas: route the TSLib encoder FFN through the
    # single-pass Pallas matmul-epilogue kernel (ops/pallas/ffn_kernel.py)
    # on TPU with hash dropout (PatchTST/Informer encoders). Default off
    # until the measured accept bar (tools/bench_ffn_fused.py, >=1.10x
    # flagship step) is met on hardware.
    use_fused_ffn: bool = False
    # sub-flag of use_pallas: single-pass Pallas causal attention for the
    # frozen GPT-2 core in TimeLLM (ops/pallas/attn_kernel.py) — the
    # [T, T] probability tensor stays in VMEM. Default off until the
    # >=1.10x accept bar is measured (tools/bench_timellm_attn.py).
    use_fused_attn: bool = False
    # device-resident epoch loop: keep all collated windows in HBM and run
    # each epoch as one lax.scan dispatch (50x fewer host round-trips);
    # falls back to per-batch streaming for batch-dependent collates (ODE
    # path), oversized splits, or device_loop=False
    device_loop: bool = True
    device_loop_max_mb: int = 4096  # resident-split size cap before fallback
    # observability: write a jax.profiler trace of the first post-compile
    # epoch to this directory (inspect with tools/trace_top_ops.py or
    # TensorBoard); debug_nans enables jax's NaN-trapping mode (the
    # under-jit replacement for the reference's per-module NaN hooks)
    profile_dir: str | None = None
    debug_nans: bool = False
    rec_ids: tuple | None = None  # entity subset (reference: main.py args.rec_ids)

    # --- derived at data-build time (main.py:984-987) ---
    input_dim: int = 0  # C / enc_in / c_out
    input_len: int = 0  # max T_obs over splits
    pred_len: int = 0  # max T_pred over splits

    def __post_init__(self):
        # A typo'd mode string must fail loudly, not silently fall through
        # to the fp32 default path (make_forward string-compares these).
        # replace() re-runs this, so every derived Config is validated too.
        if self.compute_dtype not in _COMPUTE_DTYPES:
            raise ValueError(
                f"compute_dtype must be one of {_COMPUTE_DTYPES}, "
                f"got {self.compute_dtype!r}"
            )
        if self.frozen_param_dtype not in _FROZEN_PARAM_DTYPES:
            raise ValueError(
                f"frozen_param_dtype must be one of {_FROZEN_PARAM_DTYPES}, "
                f"got {self.frozen_param_dtype!r}"
            )
        if self.dropout_impl not in _DROPOUT_IMPLS:
            raise ValueError(
                f"dropout_impl must be one of {_DROPOUT_IMPLS}, "
                f"got {self.dropout_impl!r}"
            )

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    # Convenience aliases used by TSLib-style models.
    @property
    def enc_in(self) -> int:
        return self.input_dim

    @property
    def c_out(self) -> int:
        return self.input_dim

    @property
    def seq_len(self) -> int:
        return self.input_len

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), default=str, indent=2)


# ---------------------------------------------------------------------------
# Tier-3 presets — tables transcribed from reference main.py:788-923.
# ---------------------------------------------------------------------------

DATASET_PRESETS: dict[str, dict[str, Any]] = {
    # reference main.py:790-834
    "GDELT": dict(history=14, pred_window=14, stride=14, time_unit="days"),
    "RepoHealth": dict(history=31, pred_window=31, stride=31, time_unit="days"),
    "MIMIC": dict(history=24, pred_window=24, stride=24, time_unit="hours"),
    "FNSPID": dict(history=31, pred_window=31, stride=31, time_unit="days"),
    "ClusterTrace": dict(history=12, pred_window=12, stride=12, time_unit="hours"),
    "StudentLife": dict(history=31, pred_window=31, stride=31, time_unit="days"),
    "ILINet": dict(history=36, pred_window=36, stride=4, time_unit="weeks"),
    "CESNET": dict(history=7, pred_window=7, stride=7, time_unit="days"),
    "EPA-Air": dict(history=7, pred_window=7, stride=7, time_unit="days"),
}

MODEL_PRESETS: dict[str, dict[str, Any]] = {
    # reference main.py:841-923
    "Informer": dict(e_layers=2, d_layers=1, factor=3),
    "DLinear": dict(),
    "PatchTST": dict(e_layers=1, d_layers=1, n_heads=2),
    "TimesNet": dict(e_layers=2, d_layers=1, factor=3, d_model=16, d_ff=32, top_k=5),
    "TimeMixer": dict(
        e_layers=2,
        d_model=16,
        d_ff=32,
        down_sampling_layers=3,
        down_sampling_method="avg",
        down_sampling_window=2,
    ),
    "TimeLLM": dict(
        input_token_len=16,
        output_token_len=96,
        d_model=32,
        d_ff=128,
        llm_model_timellm="GPT2",
        llm_layers_timellm=6,
    ),
    "TTM": dict(
        input_token_len=16,
        output_token_len=96,
        d_model=1024,
        AP_levels=3,
        e_layers=3,
        d_layers=2,
        d_d_model=64,
        # patch_size = history // 4 applied in apply_presets (depends on dataset)
    ),
    "CRU": dict(
        cru_lsd=32,
        cru_hidden_units=32,
        ts=0.3,
        cru_enc_var_activation="square",
        cru_dec_var_activation="exp",
        grad_clip=True,
    ),
    "LatentODE": dict(
        ode_rec_dims=32, ode_units=32, ode_gru_units=32, ode_rec_layers=1, ode_gen_layers=1
    ),
    "NeuralFlow": dict(
        nf_extrap=0,
        nf_hidden_layers=3,
        nf_hidden_dim=32,
        nf_rec_dims=40,
        nf_latents=20,
        nf_gru_units=32,
        nf_flow_model="coupling",
        nf_flow_layers=2,
        nf_time_net="TimeLinear",
        nf_time_hidden_dim=8,
    ),
    "tPatchGNN": dict(
        patch_size=24,
        n_heads=1,
        tf_layer=1,
        nlayer=1,
        te_dim=10,
        node_dim=10,
        hid_dim=32,
        outlayer="Linear",
    ),
}

DATASETS = tuple(DATASET_PRESETS)
MTS_MODELS = ("Informer", "DLinear", "PatchTST", "TimesNet", "TimeMixer")
LMTS_MODELS = ("TimeLLM", "TTM")
IMTS_MODELS = ("CRU", "LatentODE", "NeuralFlow", "tPatchGNN")
MODELS = MTS_MODELS + LMTS_MODELS + IMTS_MODELS
TTF_MODULES = ("TTF_RecAvg", "TTF_T2V_XAttn")
MMF_MODULES = ("MMF_GR_Add", "MMF_XAttn_Add")


def apply_presets(
    cfg: Config,
    fixed_params: dict | None = None,
    tunable_params: dict | None = None,
) -> Config:
    """Apply the reference's overlay order (main.py:926-942):

    fixed_params -> tunable_params -> dataset presets -> model presets.

    Only applied when cfg.overwrite_args is True, matching main.py:936.
    Duplicate keys across fixed/tunable raise, matching main.py:931-933.
    """
    fixed_params = fixed_params or {}
    tunable_params = tunable_params or {}
    dup = set(fixed_params) & set(tunable_params)
    if dup:
        raise ValueError(f"Duplicated keys found: {dup}")

    if not cfg.overwrite_args:
        return cfg

    updates: dict[str, Any] = {}
    updates.update(fixed_params)
    updates.update(tunable_params)
    cfg = cfg.replace(**{k: v for k, v in updates.items() if hasattr(cfg, k)})

    ds_preset = DATASET_PRESETS.get(cfg.dataset, {})
    cfg = cfg.replace(**ds_preset)

    model_preset = dict(MODEL_PRESETS.get(cfg.model, {}))
    cfg = cfg.replace(**model_preset)
    if cfg.model == "TTM":
        # reference main.py:884 — patch_size derived from (post-dataset-preset) history
        cfg = cfg.replace(patch_size=cfg.history // 4)
    return cfg


# Execution-environment knobs that must NOT travel with an experiment:
# they describe the machine a run happened on, not the experiment itself.
# A training run pinned to CPU (accelerator/tunnel down) must not force
# every later serve/predict/export of that experiment onto CPU.
EPHEMERAL_FIELDS = frozenset({"platform"})


def load_saved_config(path: str) -> Config:
    """Restore a Config from the `config.json` trainable() writes next to
    an experiment's checkpoints. Tuple-typed fields come back from JSON as
    lists and are re-tupled; unknown keys (from older/newer versions) and
    EPHEMERAL_FIELDS (machine-local knobs like --platform) are ignored so
    checkpoints stay loadable across config evolution."""
    with open(path) as f:
        d = json.load(f)
    names = {f.name for f in dataclasses.fields(Config)}
    kw = {}
    for k, v in d.items():
        if k not in names or k in EPHEMERAL_FIELDS:
            continue
        kw[k] = tuple(v) if isinstance(v, list) else v
    return Config(**kw)


def restore_experiment_config(cli_cfg: Config, argv: list[str],
                              checkpoint_dir: str) -> Config | None:
    """Overlay explicitly-passed CLI flags onto an experiment's persisted
    config. Returns None when the experiment predates config persistence
    (no config.json) — callers fall back to their legacy flag paths.

    Explicit flags are detected by scanning argv for `--<field>` tokens;
    the CLI parser runs with allow_abbrev=False so a prefix abbreviation
    can't bypass the scan."""
    import os

    path = os.path.join(checkpoint_dir, "config.json")
    if not os.path.exists(path):
        return None
    names = {f.name for f in dataclasses.fields(Config)}
    explicit = {t[2:].split("=")[0] for t in argv if t.startswith("--")} & names
    base = load_saved_config(path)
    return base.replace(**{k: getattr(cli_cfg, k) for k in explicit})


def derive_npatch(history: int, patch_size: int, stride: int) -> int:
    """npatch = ceil((history - patch_size)/stride) + 1, clamped >= 1
    (reference main.py:748-750; the single implementation shared by the
    CLI parser and finalize_patching)."""
    import math

    return max(1, int(math.ceil((history - patch_size) / stride)) + 1)


def finalize_patching(cfg: Config) -> Config:
    """Derived patching values (reference lib/parse_datasets.py:742-744).

    The reference's `args.npatch or 5` fallback never fires because
    main.py:748-750 always derives npatch at arg-parse time; programmatic
    Config users who leave npatch=None get the same derivation here
    (ADVICE r1 medium)."""
    patch_size = cfg.patch_size or cfg.history // 5
    npatch = cfg.npatch
    if npatch is None:
        npatch = derive_npatch(cfg.history, patch_size, cfg.stride)
    patch_stride = cfg.patch_stride or patch_size
    return cfg.replace(patch_size=patch_size, npatch=npatch, patch_stride=patch_stride)


def resolve_max_length(cfg: Config) -> Config:
    """BERT gets 512 tokens, others 1024 (reference main.py:968-969)."""
    return cfg.replace(max_length=512 if cfg.llm_model_fusion == "BERT" else 1024)
