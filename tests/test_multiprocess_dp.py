"""TRUE multi-process data parallelism (VERDICT r3 action #6): 2 OS
processes x 4 virtual CPU devices each, joined by jax.distributed's
coordination service with gloo collectives — the only execution evidence
for the SURVEY §2.8/§5.8 multi-host (DCN) obligation that a single-process
virtual mesh cannot provide. Asserts the global mesh sees 8 devices and
that two DP train steps match the single-process 8-device result."""

import numpy as np
import pytest


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    import jax
    from jax.sharding import Mesh

    from imm_tsf_tpu.parallel.multiproc import (
        flagship_case, launch_multiprocess_dp, run_dp_steps,
    )

    results = launch_multiprocess_dp(num_processes=2, n_local=4, n_steps=2)
    assert set(results) == {0, 1}
    # replicated loss: every process must report the identical values
    np.testing.assert_array_equal(results[0], results[1])

    # single-process reference on the suite's 8 virtual devices
    cfg, batch = flagship_case(8)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    want = run_dp_steps(cfg, batch, mesh, n_steps=2)
    # gloo all-reduce ordering may differ from the single-process psum at
    # ulp level; everything else is bit-identical by construction
    np.testing.assert_allclose(results[0], want, rtol=1e-5, atol=1e-7)
