"""Pytree parameter utilities.

The reference keeps the adjacency as an ``nn.Parameter`` of the model and
excludes parameters named ``adj``/``norms`` from the Laplace posterior
(reference: laplace/baselaplace.py:119, laplace/curvature/curvature.py:77).
Here the same selection is expressed as path-based pytree filtering: the
posterior covers ``select_params(params)``, everything else stays frozen at
its current value and is merged back for forward passes.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

# Parameter-name fragments excluded from the Laplace posterior by default,
# mirroring the reference's exclusion of `adj` and `norms`.
DEFAULT_EXCLUDE = ("adj", "norms")


def _path_str(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return ".".join(parts)


def path_mask(params: Any, predicate: Callable[[str], bool]) -> Any:
    """Boolean (python bool leaves) pytree mask from a path-string predicate."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: bool(predicate(_path_str(path))), params
    )


def posterior_mask(params: Any, exclude: Iterable[str] = DEFAULT_EXCLUDE) -> Any:
    """Mask selecting parameters included in the Laplace posterior."""
    exclude = tuple(exclude)

    def pred(path: str) -> bool:
        return not any(e in path for e in exclude)

    return path_mask(params, pred)


def split_by_mask(params: Any, mask: Any) -> tuple[Any, Any]:
    """Split ``params`` into (selected, rest) trees with ``None`` placeholders."""
    selected = jax.tree_util.tree_map(
        lambda p, m: p if m else None, params, mask,
        is_leaf=lambda x: x is None,
    )
    rest = jax.tree_util.tree_map(
        lambda p, m: None if m else p, params, mask,
        is_leaf=lambda x: x is None,
    )
    return selected, rest


def merge_split(selected: Any, rest: Any) -> Any:
    """Inverse of :func:`split_by_mask`."""
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b,
        selected,
        rest,
        is_leaf=lambda x: x is None,
    )


def tree_vector(params: Any) -> jnp.ndarray:
    """Flatten a pytree of arrays into a single 1-D vector (row-major per leaf,
    leaves in tree order) — the analog of torch ``parameters_to_vector``."""
    leaves = [l for l in jax.tree_util.tree_leaves(params) if l is not None]
    if not leaves:
        return jnp.zeros((0,))
    return jnp.concatenate([jnp.ravel(l) for l in leaves])


def tree_unflattener(params: Any) -> Callable[[jnp.ndarray], Any]:
    """Return a function mapping a flat vector back to the structure of ``params``."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [np.shape(l) for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    offsets = np.cumsum([0] + sizes)

    def unflatten(vec: jnp.ndarray) -> Any:
        outs = [
            jnp.reshape(vec[offsets[i]: offsets[i + 1]], shapes[i])
            for i in range(len(leaves))
        ]
        return jax.tree_util.tree_unflatten(treedef, outs)

    return unflatten


def tree_size(params: Any) -> int:
    return sum(int(np.prod(np.shape(l)))
               for l in jax.tree_util.tree_leaves(params) if l is not None)


def tree_random_normal(key, params: Any, dtype=None) -> Any:
    """Pytree of iid standard normals matching ``params``' shapes."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    outs = [
        jax.random.normal(k, np.shape(l), dtype or l.dtype)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, outs)


def tree_dot(a: Any, b: Any) -> jnp.ndarray:
    """Inner product of two same-structure pytrees."""
    parts = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, parts, jnp.asarray(0.0))


def tree_add(a: Any, b: Any, alpha: float = 1.0) -> Any:
    return jax.tree_util.tree_map(lambda x, y: x + alpha * y, a, b)


def tree_scale(a: Any, alpha) -> Any:
    return jax.tree_util.tree_map(lambda x: alpha * x, a)


def tree_zeros_like(a: Any) -> Any:
    return jax.tree_util.tree_map(jnp.zeros_like, a)


def named_leaves(params: Any) -> list[tuple[str, jnp.ndarray]]:
    """(dotted-path, leaf) pairs in tree order."""
    out = []

    def visit(path, leaf):
        out.append((_path_str(path), leaf))
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return out


def parameters_per_layer(params: Any) -> list[int]:
    """Number of parameters per leaf, in flatten order
    (reference laplace/utils/utils.py:104-117)."""
    import numpy as np
    return [int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)]
