"""End-to-end slice: DLinear on synthetic EPA-Air, text off — the first
milestone from SURVEY.md §7 build order. Verifies the full stack: data ->
collate -> jitted train step -> early-stopping protocol -> metrics."""

import numpy as np

from imm_tsf_tpu.config import Config
from imm_tsf_tpu.data.loader import parse_datasets
from imm_tsf_tpu.training.trainer import trainable


def test_dlinear_end_to_end(synth_root):
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, enable_text=False, epoch=5, patience=2,
    )
    res = trainable(cfg)
    assert np.isfinite(res["mse"]) and np.isfinite(res["mae"])
    assert res["mse"] > 0
    # training reduced loss vs first epoch
    losses = [h["train_loss"] for h in res["history"]]
    assert losses[-1] < losses[0] * 1.5  # sanity: not diverging


def test_dlinear_forward_shapes(synth_root):
    import jax

    from imm_tsf_tpu.models import get_model

    cfg = Config(dataset="EPA-Air", data_root=synth_root, model="DLinear",
                 history=7, pred_window=7, stride=7, time_unit="days",
                 batch_size=8, enable_text=False)
    data = parse_datasets(cfg, verbose=False)
    cfg = data["cfg"]
    model = get_model(cfg)
    batch = next(iter(data["train_dataloader"]))
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["tp_to_predict"], batch["observed_data"],
        batch["observed_tp"], batch["observed_mask"],
    )
    pred = model.apply(
        variables,
        batch["tp_to_predict"], batch["observed_data"],
        batch["observed_tp"], batch["observed_mask"],
    )
    assert pred.shape == batch["data_to_predict"].shape
    assert not np.isnan(np.asarray(pred)).any()


def test_trainable_no_test_split_falls_back_to_val(synth_root):
    """A dataset without a test split trains to completion and reports
    best-epoch VAL metrics (the vmap_sweep fallback) instead of crashing
    on the final assert."""
    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model="DLinear",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=16, enable_text=False, epoch=2, patience=2,
    )
    data_obj = parse_datasets(cfg, verbose=False)
    data_obj["test_dataloader"] = None
    res = trainable(cfg, data_obj=data_obj)
    assert np.isfinite(res["mse"]) and res["best_iter"] >= 0


def test_wrap_data_loaders_does_not_mutate_caller(synth_root):
    """wrap_data_loaders returns a COPY: calling trainable twice on one
    parsed data_obj must not stack preprocessing wrappers (a stacked
    _EmbedNotesLoader would re-embed every note per epoch)."""
    from imm_tsf_tpu.training.trainer import (_TimeLLMPromptLoader,
                                              wrap_data_loaders)

    cfg = Config(
        dataset="EPA-Air", data_root=synth_root, model="TimeLLM",
        history=7, pred_window=7, stride=7, time_unit="days",
        batch_size=8, enable_text=False, timellm_exact_prompt=True,
        llm_model_timellm="GPT2",
    )
    data_obj = parse_datasets(cfg, verbose=False)
    orig_train = data_obj["train_dataloader"]
    wrapped = wrap_data_loaders(cfg, data_obj)
    assert data_obj["train_dataloader"] is orig_train  # caller untouched
    assert isinstance(wrapped["train_dataloader"], _TimeLLMPromptLoader)
    rewrapped = wrap_data_loaders(cfg, data_obj)  # second call: one layer
    assert not isinstance(rewrapped["train_dataloader"].base,
                          _TimeLLMPromptLoader)
