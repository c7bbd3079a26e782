"""Launch (or resume) the full 9-preset sweep on synthetic fixtures.

The BENCHMARKS.md "Full 9-dataset sweep" section is produced by running
the real `main_all.py` driver over dataset-shaped synthetic fixtures
(imm_tsf_tpu/data/synthetic.py PRESET_FIXTURES — reference window table
main.py:790-834). This launcher makes that run reproducible:

1. (Re)builds the numeric fixtures deterministically at --fixture_root
   with --fixture_seed. sweep_results_full/'s text-off phase was
   generated with seed 2 (verified by bit-exact re-run of a recorded
   combo).
2. Computes REAL frozen-GPT2 note embeddings through the production
   compute_text_embeddings.py pipeline (skip-if-exists), so text-on
   combos exercise the genuine L1 embeddings artifact contract.
3. Exec's main_all.py pointed at the fixtures, passing every extra
   argument through. Resume-by-result-file means relaunching after an
   outage (or on a fresh host) only runs what's missing.

Typical usage:

    # full surface (both text phases), resuming into sweep_results_full
    python tools/run_full_sweep.py --results_dir sweep_results_full

    # text-on phase only
    python tools/run_full_sweep.py --results_dir sweep_results_full \
        --enable_text 1
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from imm_tsf_tpu.data.dataset import embeddings_filename  # noqa: E402
from imm_tsf_tpu.data.synthetic import (  # noqa: E402
    PRESET_FIXTURES,
    make_preset_dataset,
)


def build_fixtures(root: str, seed: int) -> None:
    import shutil

    for ds in PRESET_FIXTURES:
        ds_dir = os.path.join(root, ds)
        marker = os.path.join(ds_dir, ".fixture_seed")
        if os.path.exists(marker):
            with open(marker) as f:
                have = f.read().strip()
            if have == str(seed):
                continue
            # different seed: wipe the whole dataset dir — leaving the old
            # numeric data or its GPT2 embedding artifacts behind would let
            # a later run silently mix seeds
            shutil.rmtree(ds_dir)
            print(f"[fixtures] {ds}: seed changed {have} -> {seed}, rebuilt",
                  flush=True)
        # default generator params: the synthetic embedding draw is part of
        # the rng stream, so it must stay enabled for bit-compatibility with
        # recorded results even though the sweep reads the GPT2 artifacts
        # computed below (parked at a different layers=6 filename)
        make_preset_dataset(ds, root, seed=seed)
        with open(marker, "w") as f:
            f.write(str(seed))
        print(f"[fixtures] built {ds} (seed={seed})", flush=True)


def _artifact_ok(path_pt: str, expect_unit: str) -> bool:
    """True iff an embeddings artifact exists AND carries the right unit."""
    from imm_tsf_tpu.data.dataset import _load_embeddings_file

    try:
        _load_embeddings_file(path_pt, expect_unit=expect_unit)
        return True
    except FileNotFoundError:
        return False
    except ValueError:
        return False


def compute_embeddings(root: str, llm: str, max_length: int) -> None:
    """Real frozen-LLM note embeddings via the production CLI (layers=full).

    An artifact computed with the wrong time unit (e.g. days rel-times for
    the hours-unit MIMIC preset — the pre-fix behavior) counts as missing
    and is deleted so the recompute below regenerates it.
    """
    from imm_tsf_tpu.config import DATASET_PRESETS

    fname = embeddings_filename(llm, None, max_length)
    missing = []
    for ds in PRESET_FIXTURES:
        unit = DATASET_PRESETS.get(ds, {}).get("time_unit", "days")
        proc = os.path.join(root, ds, "processed")
        bad = [
            ent for ent in sorted(os.listdir(proc))
            if not _artifact_ok(os.path.join(proc, ent, fname), unit)
        ]
        if bad:
            for ent in bad:  # drop stale/mismatched artifacts before recompute
                for p in (os.path.join(proc, ent, fname),
                          os.path.join(proc, ent, fname[:-3] + ".npz")):
                    if os.path.isfile(p):
                        os.remove(p)
                        print(f"[embeddings] {ds}/{ent}: dropped stale artifact",
                              flush=True)
            missing.append(ds)
    if not missing:
        return
    subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "compute_text_embeddings.py"),
            "--datasets",
            *missing,
            "--llm_model_fusion",
            llm,
            "--data_root",
            root,
        ],
        check=True,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument(
        "--fixture_root",
        default="/tmp/imm_tsf_preset_fixtures",
        help="where the synthetic preset fixtures live (rebuilt if absent)",
    )
    ap.add_argument(
        "--fixture_seed",
        type=int,
        default=2,
        help="generation seed — MUST match the seed of any results being "
        "resumed (the fixture dirs carry a .fixture_seed marker; "
        "sweep_results_full/ was generated with seed 2, verified by "
        "bit-exact re-run of a recorded combo)",
    )
    ap.add_argument(
        "--skip_embeddings",
        action="store_true",
        help="skip the GPT2 embedding precompute (text-off-only sweeps)",
    )
    args, passthrough = ap.parse_known_args(argv)

    build_fixtures(args.fixture_root, args.fixture_seed)
    if not args.skip_embeddings:
        compute_embeddings(args.fixture_root, "GPT2", 1024)

    cmd = [
        sys.executable,
        os.path.join(_REPO, "main_all.py"),
        "--data_root",
        args.fixture_root,
        *passthrough,
    ]
    print("[exec]", " ".join(cmd), flush=True)
    os.execv(sys.executable, cmd)


if __name__ == "__main__":
    main()
