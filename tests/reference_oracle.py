"""Import helpers for using the READ-ONLY reference implementation
(/root/reference, PyTorch) as a numerical oracle in parity tests.

The reference's stylegan2.utils imports torchvision/yaml/matplotlib which are
not installed; they are stubbed with empty modules (none of their symbols are
touched by the model forward paths under test).
"""

import sys
import types

REFERENCE = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def add_reference_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # stubs for modules the reference imports at module scope but the
    # forward paths never call
    _stub("torchvision")
    _stub("torchvision.utils", make_grid=None, save_image=None)
    _stub("torchvision.transforms")
    _stub("yaml", safe_load=lambda *a, **k: {}, dump=lambda *a, **k: "")
    _stub("tqdm", tqdm=lambda x, **k: x, trange=range)
    mpl = _stub("matplotlib")
    _stub("matplotlib.pyplot")
    mpl.pyplot = sys.modules["matplotlib.pyplot"]


def randomize_module(module, seed: int = 0, std: float = 0.02):
    """Fill every parameter AND buffer of a torch module with reproducible
    N(0, std) noise (uninitialized reference params contain torch.empty
    garbage, e.g. reference clip/model.py:286-289)."""
    import numpy as np
    import torch

    rng = np.random.default_rng(seed)
    with torch.no_grad():
        for name, p in module.named_parameters():
            p.copy_(torch.from_numpy(
                rng.normal(0.0, std, p.shape).astype(np.float32)))
    return module
