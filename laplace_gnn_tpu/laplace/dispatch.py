"""Laplace() dispatcher: maps (subset_of_weights, hessian_structure) to the
right flavor class by walking the subclass tree (reference
laplace/laplace.py:13-47)."""

from __future__ import annotations

from .base import ParametricLaplace
from .flavors import DiagLaplace, FullLaplace, KronLaplace, LowRankLaplace
from .functional import FunctionalLaplace, FunctionalLLLaplace
from .lllaplace import DiagLLLaplace, FullLLLaplace, KronLLLaplace
from .subnet import DiagSubnetLaplace, FullSubnetLaplace, SubnetLaplace


def _all_subclasses(cls):
    out = set(cls.__subclasses__())
    for c in list(out):
        out |= _all_subclasses(c)
    return out


def Laplace(model, params, likelihood: str,
            subset_of_weights: str = "last_layer",
            hessian_structure: str = "kron",
            *args, **kwargs):
    """Simplified Laplace access (reference laplace/laplace.py:13).

    Parameters mirror the reference, with the JAX-necessary explicit
    ``params`` pytree after ``model``.
    """
    if subset_of_weights == "subnetwork" and hessian_structure not in ("full",
                                                                       "diag"):
        raise ValueError("Subnetwork Laplace requires a full or diagonal "
                         "Hessian approximation!")
    key = (subset_of_weights, hessian_structure)
    for cls in (_all_subclasses(ParametricLaplace)
                | {FunctionalLaplace, FunctionalLLLaplace}):
        if getattr(cls, "_key", None) == key:
            return cls(model, params, likelihood, *args, **kwargs)
    raise ValueError(f"No Laplace flavor for {key}.")
