"""Import the reference PyTorch implementation (read-only at /root/reference)
for parity testing, stubbing the native deps absent from this image
(numba, torchdiffeq). Torch runs on CPU only.

The stub odeint implements torchdiffeq's fixed-grid euler semantics so
reference `synthesise` outputs are well-defined for parity comparison.
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        class _AnyType:
            def __getitem__(self, item):
                return self

            def __call__(self, *a, **k):
                return self

        numba.int32 = _AnyType()
        numba.float32 = _AnyType()
        numba.void = _AnyType()

        def jit(signature=None, **kwargs):
            def deco(fn):
                return fn

            return deco

        numba.jit = jit
        sys.modules["numba"] = numba

    if "torchdiffeq" not in sys.modules:
        import torch

        td = types.ModuleType("torchdiffeq")

        def odeint(func, y0, t, method="euler", rtol=None, atol=None):
            """Fixed-grid euler identical to torchdiffeq's grid stepping."""
            assert method in (None, "euler"), f"stub only supports euler, got {method}"
            ys = [y0]
            y = y0
            for i in range(len(t) - 1):
                dt = t[i + 1] - t[i]
                y = y + dt * func(t[i], y)
                ys.append(y)
            return torch.stack(ys)

        td.odeint = odeint
        sys.modules["torchdiffeq"] = td


def load_reference():
    """Returns the reference namespace (models etc.) with stubs installed."""
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import config as ref_config  # /root/reference/config.py
    import models.model as ref_model
    import models.estimator as ref_estimator

    return types.SimpleNamespace(
        config=ref_config,
        model=ref_model,
        estimator=ref_estimator,
    )


def load_reference_vocos():
    _install_stubs()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from vocoders.vocos.models import model as ref_vocos_model

    return ref_vocos_model
