"""TRUE multi-process data parallelism (SURVEY.md §2.8 / §5.8 DCN path).

Everything else multi-device in this repo is one process with N virtual
devices. This module runs the SAME flagship DP training step as
`parallel/dryrun.py` across multiple OS processes joined through
`jax.distributed.initialize` (coordination service on localhost, gloo CPU
collectives) — each process owns `n_local` virtual CPU devices and the
global mesh spans all of them, exactly the topology of a multi-host TPU
pod slice where each host addresses only its own chips and gradient
all-reduce rides DCN.

Reference analog: none — the reference is single-GPU single-process
(SURVEY.md §2.8); this is a new design obligation of the TPU build.

Run one worker directly (normally spawned by `launch_multiprocess_dp`):

    python -m imm_tsf_tpu.parallel.multiproc <pid> <nproc> <port> <n_local>
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

_LOSS_RE = re.compile(r"MPDP pid=(\d+) losses=\[([^\]]+)\]")


def flagship_case(n_global: int):
    """Deterministic (cfg, numpy batch) for the flagship DLinear+fusion DP
    step — shared by the worker and the single-process reference so both
    sides construct bit-identical inputs."""
    from bench import build_batch

    from ..config import Config

    B = max(n_global * 2, 8)
    cfg = Config(
        model="DLinear", enable_text=True, use_text_embeddings=True,
        llm_model_fusion="GPT2", TTF_module="TTF_RecAvg",
        MMF_module="MMF_GR_Add", d_txt=32, input_dim=4, input_len=24,
        pred_len=12, batch_size=B, mesh_shape=(n_global,),
    )
    return cfg, build_batch(B=B, L=24, Lp=12, C=4, N=4, d_txt=32, seed=0)


def run_dp_steps(cfg, batch, mesh, n_steps: int = 2):
    """Init the flagship state from PRNGKey(0) and run `n_steps` donated
    train steps over `mesh`, returning the per-step losses. Works both
    single-process (virtual devices) and multi-process (global mesh): the
    batch is materialized as a global array via make_array_from_callback,
    so each process only touches its addressable shards."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..fusion.fusion_model import FusionModel
    from ..models import get_model
    from ..training.optim import make_optimizer
    from ..training.trainer import build_steps, init_state

    model = get_model(cfg)
    fusion = FusionModel(cfg) if cfg.enable_text else None
    params, stats = init_state(cfg, model, fusion, batch,
                               jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.lr, cfg.w_decay)
    opt_state = tx.init(params)
    train_step, _ = build_steps(cfg, model, fusion, tx)

    data_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def to_global(v: np.ndarray):
        sh = data_sh if v.ndim >= 2 else repl
        return jax.make_array_from_callback(v.shape, sh, lambda idx: v[idx])

    dev = {k: to_global(v) for k, v in batch.items()
           if isinstance(v, np.ndarray)}
    # state starts as process-local host arrays identical on every process
    # (same PRNGKey); jit replicates them onto the global mesh
    losses = []
    for i in range(n_steps):
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, dev, jax.random.PRNGKey(1 + i)
        )
        losses.append(float(loss))  # scalar -> replicated, addressable
    return losses


def worker_main(process_id: int, num_processes: int, port: int,
                n_local: int, n_steps: int = 2) -> None:
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_local}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np
    from jax.sharding import Mesh

    n_global = num_processes * n_local
    assert jax.device_count() == n_global, jax.device_count()
    assert jax.local_device_count() == n_local, jax.local_device_count()

    cfg, batch = flagship_case(n_global)
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global), ("data",))
    losses = run_dp_steps(cfg, batch, mesh, n_steps=n_steps)
    assert all(np.isfinite(x) for x in losses), losses
    print(f"MPDP pid={process_id} losses={losses!r}", flush=True)
    jax.distributed.shutdown()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_multiprocess_dp(num_processes: int = 2, n_local: int = 4,
                           n_steps: int = 2, timeout: int = 600):
    """Spawn the workers, join them, and return {pid: [losses]} parsed from
    their stdout. Raises on any nonzero exit."""
    port = _free_port()
    env = dict(os.environ)
    # the workers set their own platform/device-count env; drop any
    # inherited XLA_FLAGS so the parent's virtual-device count (e.g. the
    # test suite's 8) doesn't leak into the 4-device workers
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "imm_tsf_tpu.parallel.multiproc",
             str(pid), str(num_processes), str(port), str(n_local),
             str(n_steps)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
        )
        for pid in range(num_processes)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    results = {}
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(
                f"multiprocess DP worker {pid} exited rc={p.returncode}:\n"
                + out[-4000:]
            )
        m = _LOSS_RE.search(out)
        if not m:
            raise RuntimeError(
                f"worker {pid} produced no MPDP line:\n" + out[-4000:]
            )
        results[int(m.group(1))] = [float(x) for x in m.group(2).split(",")]
    return results


def main() -> None:
    pid, nproc, port, n_local = (int(a) for a in sys.argv[1:5])
    n_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    worker_main(pid, nproc, port, n_local, n_steps)


if __name__ == "__main__":
    main()
