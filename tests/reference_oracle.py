"""Import helpers for using the READ-ONLY reference implementation
(/root/reference, PyTorch) as a numerical oracle in parity tests.

The reference's stylegan2.utils imports torchvision/yaml/matplotlib which are
not installed; they are stubbed with empty modules (none of their symbols are
touched by the model forward paths under test).
"""

import sys
import types

REFERENCE = "/root/reference"


class _PermissiveModule(types.ModuleType):
    """Module stub returning inert placeholders for any attribute (the
    reference imports torchvision symbols at module scope that the tested
    forward paths never call)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        # a fresh type works both as a callable and as a base class
        return type(name, (), {"__init__": lambda self, *a, **k: None})


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    # prefer the REAL module when it is installed (e.g. matplotlib/yaml in
    # this image): registering a permissive stub under a real module's name
    # would poison every later import in the process (the production
    # save_scatter renders F.jpg through real matplotlib)
    import importlib
    import importlib.machinery
    try:
        return importlib.import_module(name)
    except ImportError:
        pass
    mod = _PermissiveModule(name)
    # transformers probes availability via find_spec; a None __spec__ raises
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    mod.__version__ = "0.0.0"
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def add_reference_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    # stubs for modules the reference imports at module scope but the
    # forward paths never call
    tv = _stub("torchvision")
    tv.utils = _stub("torchvision.utils")
    tv.transforms = _stub("torchvision.transforms")
    tv.models = _stub("torchvision.models")
    tv.datasets = _stub("torchvision.datasets")
    _stub("yaml", safe_load=lambda *a, **k: {}, dump=lambda *a, **k: "")
    _stub("tqdm", tqdm=lambda x, **k: x, trange=range)
    mpl = _stub("matplotlib")
    _stub("matplotlib.pyplot")
    mpl.pyplot = sys.modules["matplotlib.pyplot"]


def import_reference_stylegan2():
    """Import ONLY stylegan2.{utils,modules,models} from the reference without
    executing stylegan2/__init__.py (which pulls in inception/tensorboard/apex
    dependencies irrelevant to the forward paths under test)."""
    import importlib

    add_reference_path()
    if "stylegan2" not in sys.modules or not hasattr(sys.modules["stylegan2"], "__path__"):
        pkg = types.ModuleType("stylegan2")
        pkg.__path__ = [REFERENCE + "/stylegan2"]
        sys.modules["stylegan2"] = pkg
    modules = importlib.import_module("stylegan2.modules")
    models = importlib.import_module("stylegan2.models")
    return models, modules


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
