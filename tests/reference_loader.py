"""Load reference (/root/reference) modules so parity tests can *execute*
the reference implementation and pin our outputs against it.

Only third-party packages absent from this environment are stubbed
(torch_geometric, torchmetrics, and the curvature-backend packages); the
stubs satisfy import-time attribute lookups exclusively — every numerical
code path the tests execute is the reference's own torch code.

Bypassed package __init__ files: ``laplace/__init__.py`` (pulls the full
curvature-backend chain) — the submodules under test
(laplace/utils/{utils,enums,matrix,metrics}.py and laplace/baselaplace.py)
are loaded directly by file path under their canonical dotted names, so
their own absolute/relative imports resolve normally.
"""

from __future__ import annotations

import functools
import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _shell_module(name: str, **attrs) -> types.ModuleType:
    """Register an empty package shell (or attribute-stub) in sys.modules."""
    m = types.ModuleType(name)
    m.__path__ = []  # mark as package so submodule registration works
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _load_file(fullname: str, relpath: str) -> types.ModuleType:
    spec = importlib.util.spec_from_file_location(
        fullname, f"{REFERENCE_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@functools.lru_cache(maxsize=1)
def load_reference() -> types.SimpleNamespace:
    """Import the executable reference modules (cached).

    Returns a namespace with: gnn_utils, gnn_layers, gnn_base, gnn_models,
    l_utils, l_enums, l_matrix, baselaplace.
    """
    import torch.nn as nn

    # --- stubs for import-time-only dependencies ---------------------------
    if "torchmetrics" not in sys.modules:
        _shell_module("torchmetrics", Metric=type("Metric", (), {}))

    def activation_resolver(act="relu", **kw):
        # minimal stand-in for torch_geometric.nn.resolver.activation_resolver
        if callable(act) and not isinstance(act, str):
            return act
        table = {"relu": nn.ReLU, "elu": nn.ELU, "tanh": nn.Tanh,
                 "gelu": nn.GELU, "leaky_relu": nn.LeakyReLU,
                 "sigmoid": nn.Sigmoid, None: nn.Identity, "none": nn.Identity}
        key = act.lower() if isinstance(act, str) else act
        return table[key](**kw)

    if "torch_geometric" not in sys.modules:
        _shell_module("torch_geometric")
        _shell_module("torch_geometric.nn")
        _shell_module("torch_geometric.nn.resolver",
                      activation_resolver=activation_resolver)

    # --- gnn.models.* (no gnn/__init__.py in the reference) ----------------
    _shell_module("gnn")
    _shell_module("gnn.models")
    gnn_utils = _load_file("gnn.models.utils", "gnn/models/utils.py")
    gnn_layers = _load_file("gnn.models.layers", "gnn/models/layers.py")
    gnn_base = _load_file("gnn.models.base_gnn", "gnn/models/base_gnn.py")
    gnn_models = _load_file("gnn.models.models", "gnn/models/models.py")

    # --- laplace.utils.* (bypassing laplace/__init__.py) --------------------
    _shell_module("laplace")
    _shell_module("laplace.utils")
    l_enums = _load_file("laplace.utils.enums", "laplace/utils/enums.py")
    l_utils = _load_file("laplace.utils.utils", "laplace/utils/utils.py")
    l_matrix = _load_file("laplace.utils.matrix", "laplace/utils/matrix.py")
    l_metrics = _load_file("laplace.utils.metrics", "laplace/utils/metrics.py")
    # names baselaplace pulls from the laplace.utils package itself
    sys.modules["laplace.utils"].SoDSampler = l_utils.SoDSampler

    # --- curvature-backend stubs (import-time names only) ------------------
    _shell_module("laplace.curvature")
    for sub, names in (("asdfghjkl", ["AsdfghjklHessian"]),
                       ("asdl", ["AsdlGGN"]),
                       ("backpack", ["BackPackGGN"]),
                       ("curvature", ["CurvatureInterface"]),
                       ("curvlinops", ["CurvlinopsEF", "CurvlinopsGGN",
                                       "CurvlinopsHessian"])):
        _shell_module(f"laplace.curvature.{sub}",
                      **{n: type(n, (), {}) for n in names})

    baselaplace = _load_file("laplace.baselaplace", "laplace/baselaplace.py")

    return types.SimpleNamespace(
        gnn_utils=gnn_utils, gnn_layers=gnn_layers, gnn_base=gnn_base,
        gnn_models=gnn_models, l_utils=l_utils, l_enums=l_enums,
        l_matrix=l_matrix, l_metrics=l_metrics, baselaplace=baselaplace)
