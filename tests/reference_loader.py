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


# ---------------------------------------------------------------------------
# Full executable chain: vendored curvlinops KFAC engine + real laplace
# curvature backends + Laplace dispatcher + the reference GNN experiment
# layer. Used by the composite-hyperstep and full-trajectory parity tests.
# ---------------------------------------------------------------------------

def _install_backpack_hessianfree():
    """backpack-for-pytorch is absent; the reference only consumes two of its
    hessianfree primitives, which are the standard double-backward identities.
    Reimplemented here (NOT copied) so curvlinops' GGN/Hessian/EF/FisherMC
    operators execute for real."""
    import torch
    from torch.autograd import grad

    def _r_op(ys, xs, vs):
        """Jacobian-vector product d(ys)/d(xs) @ vs via two vjps."""
        ws = [torch.zeros_like(y, requires_grad=True) for y in ys]
        gs = grad(ys, xs, grad_outputs=ws, create_graph=True,
                  retain_graph=True, allow_unused=True)
        gs = [g for g in gs if g is not None]
        return grad(gs, ws, grad_outputs=vs, retain_graph=True,
                    create_graph=True)

    def hessian_vector_product(f, params, v, grad_params=None):
        if grad_params is None:
            grad_params = grad(f, params, create_graph=True,
                               retain_graph=True)
        dot = sum((g * vi).sum() for g, vi in zip(grad_params, v))
        return tuple(grad(dot, params, retain_graph=True))

    def ggn_vector_product_from_plist(loss, output, plist, v):
        Jv, = _r_op([output], plist, v)
        HJv = hessian_vector_product(loss, [output], [Jv])
        return tuple(grad(output, plist, grad_outputs=HJv[0],
                          retain_graph=True))

    _shell_module("backpack")
    _shell_module("backpack.hessianfree")
    _shell_module("backpack.hessianfree.hvp",
                  hessian_vector_product=hessian_vector_product)
    _shell_module("backpack.hessianfree.ggnvp",
                  ggn_vector_product_from_plist=ggn_vector_product_from_plist)


def _pyg_homophily(edge_index, y, method="edge"):
    """Working stand-in for torch_geometric.utils.homophily (edge method):
    fraction of edges whose endpoints share a label."""
    src, dst = edge_index[0].long(), edge_index[1].long()
    if src.numel() == 0:
        return 0.0
    return float((y[src] == y[dst]).float().mean())


@functools.lru_cache(maxsize=1)
def load_reference_full() -> types.SimpleNamespace:
    """load_reference() + the EXECUTABLE curvature/Laplace/experiment chain:

    - curvlinops/{_base,utils,kfac_utils,kfac,ggn,hessian,fisher,
      gradient_moments}.py loaded for real (einconv stubbed — its functions
      are only reached on Conv2d paths, which these tests never take;
      backpack's two hessianfree primitives reimplemented above),
    - laplace/curvature/{curvature,curvlinops}.py loaded for real,
    - laplace/baselaplace.py RE-executed so KronLaplace binds the real
      CurvlinopsGGN backend, plus laplace/laplace.py (the dispatcher),
    - gnn/{utils,plots.utils,plots.interaction_bounds,marglik_training}.py
      with import-time-only stubs (GPUtil, torch_geometric datasets/knn;
      torch_geometric.utils.homophily gets a working 3-line stand-in since
      the training loop calls it for diagnostics).

    Returns the load_reference() namespace extended with: kfac (curvlinops
    KFAC module), cl_base, l_curv_curvlinops, baselaplace (rebound), Laplace
    (dispatcher callable), gnn_train (reference gnn/marglik_training module).
    """
    import torch

    base = load_reference()

    # --- einconv / backpack stubs ------------------------------------------
    def _no_conv(*a, **k):
        raise RuntimeError("einconv stub: Conv2d KFAC paths are not "
                           "executable in this environment")

    if "einconv" not in sys.modules:
        _shell_module("einconv", index_pattern=_no_conv)
        _shell_module("einconv.utils", get_conv_paddings=_no_conv)
    _install_backpack_hessianfree()

    # --- vendored curvlinops (real) ----------------------------------------
    _shell_module("curvlinops")
    cl_base = _load_file("curvlinops._base", "curvlinops/_base.py")
    cl_utils = _load_file("curvlinops.utils", "curvlinops/utils.py")
    _load_file("curvlinops.kfac_utils", "curvlinops/kfac_utils.py")
    kfac = _load_file("curvlinops.kfac", "curvlinops/kfac.py")
    ggn = _load_file("curvlinops.ggn", "curvlinops/ggn.py")
    hessian = _load_file("curvlinops.hessian", "curvlinops/hessian.py")
    fisher = _load_file("curvlinops.fisher", "curvlinops/fisher.py")
    ef = _load_file("curvlinops.gradient_moments",
                    "curvlinops/gradient_moments.py")
    cl = sys.modules["curvlinops"]
    cl.KFACLinearOperator = kfac.KFACLinearOperator
    cl.FisherType = kfac.FisherType
    cl.KFACType = kfac.KFACType
    cl.GGNLinearOperator = ggn.GGNLinearOperator
    cl.HessianLinearOperator = hessian.HessianLinearOperator
    cl.FisherMCLinearOperator = fisher.FisherMCLinearOperator
    cl.EFLinearOperator = ef.EFLinearOperator

    # --- real laplace curvature backends ------------------------------------
    lu = sys.modules["laplace.utils"]
    lu.Kron = base.l_matrix.Kron
    lu.KronDecomposed = base.l_matrix.KronDecomposed
    lu.Likelihood = base.l_enums.Likelihood
    l_curv = sys.modules["laplace.curvature"]
    curvature = _load_file("laplace.curvature.curvature",
                           "laplace/curvature/curvature.py")
    l_curv.CurvatureInterface = curvature.CurvatureInterface
    l_curv.GGNInterface = curvature.GGNInterface
    l_curv.EFInterface = curvature.EFInterface
    l_curv_curvlinops = _load_file("laplace.curvature.curvlinops",
                                   "laplace/curvature/curvlinops.py")
    for n in ("CurvlinopsGGN", "CurvlinopsEF", "CurvlinopsHessian"):
        setattr(l_curv, n, getattr(l_curv_curvlinops, n))

    # --- re-execute baselaplace bound to the REAL backends, + dispatcher ----
    baselaplace = _load_file("laplace.baselaplace", "laplace/baselaplace.py")
    dispatcher = _load_file("laplace.laplace", "laplace/laplace.py")
    sys.modules["laplace"].Laplace = dispatcher.Laplace
    sys.modules["laplace"].baselaplace = baselaplace

    # --- reference gnn experiment layer --------------------------------------
    if "GPUtil" not in sys.modules:
        _shell_module("GPUtil", getAvailable=lambda **k: [])
    tg_utils = sys.modules.get("torch_geometric.utils") or _shell_module(
        "torch_geometric.utils")
    tg_utils.homophily = _pyg_homophily
    tg_utils.to_scipy_sparse_matrix = _no_conv
    tg_nn = sys.modules["torch_geometric.nn"]
    if not hasattr(tg_nn, "knn_graph"):
        tg_nn.knn_graph = _no_conv
    _shell_module("torch_geometric.data", Data=type("Data", (), {}))
    _shell_module("torch_geometric.datasets",
                  **{n: _no_conv for n in ("KarateClub", "Planetoid",
                                           "Actor", "WikipediaNetwork",
                                           "WebKB")})

    # gnn.models was registered as an empty shell by load_reference();
    # gnn/marglik_training.py does `from gnn.models import GCN, ...`
    gm = sys.modules["gnn.models"]
    for n in ("GCN", "STEGCN", "LoRASTEGCN", "GAT", "STEGraphSAGE",
              "GraphSAGE"):
        setattr(gm, n, getattr(base.gnn_models, n))

    gnn_utils_mod = _load_file("gnn.utils", "gnn/utils.py")
    _shell_module("gnn.plots")
    _load_file("gnn.plots.utils", "gnn/plots/utils.py")
    _load_file("gnn.plots.interaction_bounds",
               "gnn/plots/interaction_bounds.py")
    gnn_train = _load_file("gnn.marglik_training", "gnn/marglik_training.py")

    ns = types.SimpleNamespace(**vars(base))
    ns.kfac = kfac
    ns.cl_base = cl_base
    ns.cl_utils = cl_utils
    ns.curvature = curvature
    ns.l_curv_curvlinops = l_curv_curvlinops
    ns.baselaplace = baselaplace           # rebound to real backends
    ns.Laplace = dispatcher.Laplace
    ns.gnn_exp_utils = gnn_utils_mod
    ns.gnn_train = gnn_train
    return ns
