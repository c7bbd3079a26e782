"""Harness for running the torch reference (/root/reference) on CPU in
parity tests: dependency stubs for packages absent from this image and a
default-args builder that reuses the reference's own CLI parser.

The torchdiffeq shim implements exactly the path the reference exercises:
fixed-grid odeint evaluating at every t with one rk4(3/8) step per
interval (the reference hard-codes method='rk4',
lib/latent_ode_components/diffeq_solver.py:44-47; torchdiffeq's 'rk4'
uses rk4_alt_step_func, the 3/8 rule, with grid == t when no step_size
option is given)."""

from __future__ import annotations

import contextlib
import sys
import types

REF = "/root/reference"


def install_stubs() -> None:
    import torch

    if "prettytable" not in sys.modules:
        mod = types.ModuleType("prettytable")
        mod.PrettyTable = type(
            "PT", (),
            {"__init__": lambda s, *a, **k: None,
             "add_row": lambda s, *a: None,
             "__str__": lambda s: "",
             "field_names": None},
        )
        sys.modules["prettytable"] = mod
    if "tqdm" not in sys.modules:
        mod = types.ModuleType("tqdm")

        class _Tqdm:
            """Pass-through iterator with the progress-bar methods the
            reference epoch loop calls (main.py:1064,1105)."""

            def __init__(self, iterable=None, *a, **k):
                self._it = iterable

            def __iter__(self):
                return iter(self._it)

            def set_description(self, *a, **k):
                pass

            def close(self):
                pass

        mod.tqdm = _Tqdm
        sys.modules["tqdm"] = mod
    if "reformer_pytorch" not in sys.modules:
        mod = types.ModuleType("reformer_pytorch")
        mod.LSHSelfAttention = object
        sys.modules["reformer_pytorch"] = mod
    if "geotorch" not in sys.modules:
        # only used on the f-CRU path (CRUCell.py:202, args.f_cru=False here)
        mod = types.ModuleType("geotorch")
        mod.orthogonal = lambda *a, **k: None
        sys.modules["geotorch"] = mod
    if "stribor" not in sys.modules:
        # functional shim reimplementing the published continuous-coupling
        # math (tests/stribor_shim.py) so the reference NeuralFlow runs
        # head-to-head despite stribor having no wheel in this image
        import stribor_shim

        mod = types.ModuleType("stribor")
        mod.ContinuousAffineCoupling = stribor_shim.ContinuousAffineCoupling
        mod.Flow = stribor_shim.Flow
        mod.net = stribor_shim.net
        sys.modules["stribor"] = mod
    if "torchdiffeq" not in sys.modules:
        mod = types.ModuleType("torchdiffeq")

        def odeint(func, y0, t, rtol=None, atol=None, method="rk4",
                   options=None):
            ys = [y0]
            y = y0
            for i in range(len(t) - 1):
                t0, t1 = t[i], t[i + 1]
                dt = t1 - t0
                if method == "euler":
                    y = y + func(t0, y) * dt
                else:  # rk4 (3/8 rule, torchdiffeq rk4_alt_step_func)
                    k1 = func(t0, y)
                    k2 = func(t0 + dt / 3, y + dt * k1 / 3)
                    k3 = func(t0 + dt * 2 / 3, y + dt * (k2 - k1 / 3))
                    k4 = func(t0 + dt, y + dt * (k1 - k2 + k3))
                    y = y + (k1 + 3 * (k2 + k3) + k4) * dt * 0.125
                ys.append(y)
            return torch.stack(ys)

        mod.odeint = odeint
        mod.odeint_adjoint = odeint
        sys.modules["torchdiffeq"] = mod

    # the reference hard-codes .cuda() on tPatchGNN nodevecs
    # (models/tPatchGNN.py:131-132); neutralize on a CPU-only image
    if not torch.cuda.is_available() and not getattr(torch.Tensor.cuda,
                                                     "_ref_shim", False):
        def _cpu_cuda(self, *a, **k):
            return self

        _cpu_cuda._ref_shim = True
        torch.Tensor.cuda = _cpu_cuda


@contextlib.contextmanager
def reference_path():
    install_stubs()
    sys.path.insert(0, REF)
    try:
        yield
    finally:
        if REF in sys.path:
            sys.path.remove(REF)


def ref_default_args(**overrides):
    """Full reference args namespace via the reference's OWN parser
    (main.py:43-759 defaults), with overrides applied afterwards.

    NOTE: the reference derives npatch at parse time (main.py:748-750)
    from the pre-override values; tests that override patching must pass
    explicit npatch/patch_size/patch_stride to BOTH frameworks."""
    import importlib.util
    import torch

    with reference_path():
        if "_ref_main" not in sys.modules:
            spec = importlib.util.spec_from_file_location(
                "_ref_main", REF + "/main.py")
            ref_main = importlib.util.module_from_spec(spec)
            sys.modules["_ref_main"] = ref_main
            spec.loader.exec_module(ref_main)
        ref_main = sys.modules["_ref_main"]
        argv = sys.argv
        sys.argv = ["main.py"]
        try:
            args = ref_main.get_args_from_parser()
        finally:
            sys.argv = argv
    args.device = torch.device("cpu")
    for k, v in overrides.items():
        setattr(args, k, v)
    return args
