"""Opt-in real-checkpoint integration test (VERDICT r2 missing #4).

This image has zero network egress and ships no HF checkpoints, so the
frozen-LLM path is normally exercised with random-init weights + the
deterministic HashTokenizer (llm/loader.py offline fallback). The moment a
real GPT-2 checkpoint is present — `IMM_TSF_LLM_DIR/GPT2` (or `gpt2`)
holding the usual HF files (config.json, *.safetensors or
pytorch_model*.bin, tokenizer files) — this module runs the real-weight
path end to end:

  * `load_llm("GPT2")` loads the checkpoint (reference
    fusions/load_llm.py:94-107) and the REAL BPE tokenizer (pad=eos,
    :98-100), not the hash fallback;
  * TimeLLM exact-prompt mode produces real-BPE `prompt_ids`
    (models/timellm.py build_timellm_prompt_ids; reference
    models/TimeLLM.py prompt tokenization);
  * one `embed_notes` batch runs through the converted flax GPT-2.

Skipped (not failed) when no checkpoint directory is available.
"""

import os

import numpy as np
import pytest

from imm_tsf_tpu.llm.loader import HashTokenizer, _local_dir


def _real_gpt2_dir():
    d = _local_dir("GPT2", None)
    if d is None:
        return None
    # a usable checkpoint needs weights + tokenizer files, not just a dir
    import glob

    has_weights = bool(
        glob.glob(os.path.join(d, "*.safetensors"))
        or glob.glob(os.path.join(d, "pytorch_model*.bin"))
    )
    has_tok = any(
        os.path.isfile(os.path.join(d, f))
        for f in ("tokenizer.json", "vocab.json", "merges.txt")
    )
    return d if (has_weights and has_tok) else None


requires_real_gpt2 = pytest.mark.skipif(
    _real_gpt2_dir() is None,
    reason="no real GPT-2 checkpoint at IMM_TSF_LLM_DIR/GPT2 "
    "(offline image ships none — set IMM_TSF_LLM_DIR to a directory of "
    "HF checkpoints to enable)",
)


@requires_real_gpt2
def test_load_llm_real_gpt2_weights_and_bpe():
    from imm_tsf_tpu.llm.loader import load_llm, _load_state_dict

    model, params, tokenizer = load_llm("GPT2", llm_layers=2)
    assert not isinstance(tokenizer, HashTokenizer)

    # real-BPE spot check: GPT-2's canonical encoding of "Hello world"
    ids, mask = tokenizer(["Hello world"], max_length=8)
    real = ids[0][mask[0].astype(bool)].tolist()
    assert real == [15496, 995], real

    # weights came from the checkpoint, not random init: wte rows match
    sd = _load_state_dict(_real_gpt2_dir())
    wte_key = next(k for k in sd if k.endswith("wte.weight"))
    np.testing.assert_allclose(
        np.asarray(params["wte"]["embedding"][:4, :8], np.float32),
        np.asarray(sd[wte_key][:4, :8], np.float32),
        rtol=0,
        atol=1e-6,
    )


@requires_real_gpt2
def test_timellm_exact_prompt_real_bpe_ids():
    from imm_tsf_tpu.config import Config
    from imm_tsf_tpu.llm.loader import load_tokenizer
    from imm_tsf_tpu.models.timellm import (
        build_timellm_prompt_ids,
        build_timellm_prompts,
    )

    cfg = Config(model="TimeLLM", dataset="EPA-Air")
    rng = np.random.default_rng(0)
    B, T, D = 2, 16, 3
    batch = {
        "observed_data": rng.standard_normal((B, T, D)).astype(np.float32),
        "observed_tp": np.tile(np.linspace(0, 1, T, dtype=np.float32), (B, 1)),
        "observed_mask": np.ones((B, T, D), np.float32),
    }
    tok = load_tokenizer("GPT2")
    assert not isinstance(tok, HashTokenizer)
    ids = build_timellm_prompt_ids(cfg, batch, tok, pad_to=256)
    assert ids.dtype == np.int32 and ids.shape == (B, 256)

    # the ids must be the REAL BPE encoding of the generated prompt text
    prompts = build_timellm_prompts(
        cfg, batch["observed_data"], batch["observed_tp"],
        batch["observed_mask"],
    )
    want, _ = tok(prompts, max_length=256)
    np.testing.assert_array_equal(ids, np.asarray(want, np.int32))


@requires_real_gpt2
def test_embed_notes_real_checkpoint_batch():
    from imm_tsf_tpu.llm.loader import embed_notes, load_llm

    model, params, tokenizer = load_llm("GPT2", llm_layers=2)
    notes = [["Patient stable overnight.", "BP trending down."],
             ["Sensor outage 0200-0400."]]
    stats = {}
    emb, mask = embed_notes(notes, model, params, tokenizer,
                            max_length=64, stats_out=stats)
    assert emb.shape == (2, 2, 768)
    assert mask.tolist() == [[True, True], [True, False]]
    assert np.isfinite(emb).all()
    assert np.abs(emb[0, 0]).max() > 0  # real note -> nonzero embedding
    assert np.abs(emb[1, 1]).max() == 0  # padded slot zeroed
    assert stats["n_notes"] == 3 and stats["real_tokens"] > 0
