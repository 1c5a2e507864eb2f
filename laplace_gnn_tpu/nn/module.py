"""Minimal functional module system with KFAC taps.

Design (TPU-first, replaces torch ``nn.Module``/hook machinery of the
reference): a module is a static Python object with

  - ``init(key) -> params``: a dict pytree of arrays;
  - ``apply(params, x, *, taps=None, rng=None, train=False) -> out``: a pure
    function, safe under ``jax.jit``/``grad``/``vmap``.

Dense layers route their pre-activation through ``taps.tap(name, a, s)``.
This single mechanism replaces the reference's forward-pre-hooks and tensor
grad hooks (curvlinops/kfac.py:544-568, :748-875): KFAC activations ``a`` are
read off the tap records, and output gradients ``g = dL/ds`` are obtained by
differentiating w.r.t. an injected zero perturbation ``eps`` added at the tap
site. Because all of this is ordinary traced JAX, the resulting Kronecker
factors are differentiable w.r.t. *anything* upstream (e.g. the adjacency) —
the property the reference fork had to hack into torch autograd
(curvlinops/kfac.py:637-661, :789-790).

Weights are stored torch-style as ``(out_features, in_features)`` so that the
row-major flattening order matches the reference's ``parameters_to_vector``
and the Kron factor conventions [G (out×out), A (in×in)]
(laplace/utils/matrix.py:33-72).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


class TapCollector:
    """Records (name, a, s) triples at dense-layer sites; optionally adds a
    perturbation ``eps[name]`` to the pre-activation (used to extract dL/ds)."""

    def __init__(self, eps: Optional[dict] = None):
        self.records: list[tuple[str, jnp.ndarray, jnp.ndarray]] = []
        self.eps = eps

    def tap(self, name: str, a: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
        if self.eps is not None and name in self.eps:
            s = s + self.eps[name]
        self.records.append((name, a, s))
        return s


def resolve_dtype(dtype=None):
    """None -> default JAX float dtype (float64 under jax_enable_x64)."""
    return dtype if dtype is not None else jnp.result_type(float)


def _tap(taps: Optional[TapCollector], name, a, s):
    return taps.tap(name, a, s) if taps is not None else s


# ---------------------------------------------------------------------------
# Activations (mirror of torch_geometric's activation_resolver usage at
# gnn/models/base_gnn.py:85)
# ---------------------------------------------------------------------------

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "leaky_relu": jax.nn.leaky_relu,
    "silu": jax.nn.silu,
    "identity": lambda x: x,
    "none": lambda x: x,
}


def activation_resolver(act, **kwargs) -> Callable:
    if act is None:
        return lambda x: x
    if callable(act):
        return act
    fn = ACTIVATIONS[act.lower()]
    if kwargs:
        return lambda x: fn(x, **kwargs)
    return fn


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class Linear:
    """Dense layer, torch-``nn.Linear``-compatible init and param layout."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True,
                 name: str = "linear"):
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.name = name

    def init(self, key, dtype=None) -> dict:
        # torch nn.Linear default: kaiming_uniform_(a=sqrt(5)) on weight
        # => U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias likewise.
        dtype = resolve_dtype(dtype)
        wkey, bkey = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.in_features)
        params = {
            "weight": jax.random.uniform(
                wkey, (self.out_features, self.in_features), dtype,
                -bound, bound)
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                bkey, (self.out_features,), dtype, -bound, bound)
        return params

    def apply(self, params: dict, x: jnp.ndarray,
              taps: Optional[TapCollector] = None) -> jnp.ndarray:
        s = x @ params["weight"].T
        if self.use_bias:
            s = s + params["bias"]
        return _tap(taps, self.name, x, s)


class Conv2d:
    """2-D convolution, torch ``nn.Conv2d``-compatible init and weight layout
    ``(out_ch, in_ch, kh, kw)``, NCHW input.

    Implemented as im2col: patches are extracted with
    ``lax.conv_general_dilated_patches`` (feature order (c, kh, kw), matching
    the row-major flattening of the torch weight) and the conv becomes
    ``patches @ W_flat.T`` — a dense matmul that lands on the MXU. The KFAC
    tap therefore records exactly the (patch, pre-activation) pair the
    reference's conv hooks extract via einconv (curvlinops/kfac.py:839-851,
    curvlinops/kfac_utils.py:144-244), with the spatial axis as the
    weight-sharing 'expand/reduce' middle dimension.
    """

    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0, bias: bool = True, name: str = "conv"):
        self.in_channels = in_channels
        self.out_channels = out_channels
        ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) \
            else tuple(kernel_size)
        self.kernel_size = ks
        self.stride = (stride, stride) if isinstance(stride, int) \
            else tuple(stride)
        self.padding = (padding, padding) if isinstance(padding, int) \
            else tuple(padding)
        self.use_bias = bias
        self.name = name

    def init(self, key, dtype=None) -> dict:
        # torch nn.Conv2d default: kaiming_uniform_(a=sqrt(5)) =>
        # U(-1/sqrt(fan_in), 1/sqrt(fan_in)), fan_in = in_ch*kh*kw
        dtype = resolve_dtype(dtype)
        wkey, bkey = jax.random.split(key)
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        params = {
            "weight": jax.random.uniform(
                wkey, (self.out_channels, self.in_channels, kh, kw), dtype,
                -bound, bound)
        }
        if self.use_bias:
            params["bias"] = jax.random.uniform(
                bkey, (self.out_channels,), dtype, -bound, bound)
        return params

    def apply(self, params: dict, x: jnp.ndarray,
              taps: Optional[TapCollector] = None) -> jnp.ndarray:
        B, _, H, W = x.shape
        kh, kw = self.kernel_size
        sh, sw = self.stride
        ph, pw = self.padding
        # (B, C*kh*kw, H', W'), feature order (c, kh, kw)
        patches = jax.lax.conv_general_dilated_patches(
            x, filter_shape=(kh, kw), window_strides=(sh, sw),
            padding=[(ph, ph), (pw, pw)])
        Ho, Wo = patches.shape[2], patches.shape[3]
        a = jnp.moveaxis(patches.reshape(B, -1, Ho * Wo), 1, 2)  # (B, L, ckk)
        w_flat = params["weight"].reshape(self.out_channels, -1)
        s = a @ w_flat.T                                         # (B, L, out)
        if self.use_bias:
            s = s + params["bias"]
        s = _tap(taps, self.name, a, s)
        return jnp.moveaxis(s, 2, 1).reshape(B, self.out_channels, Ho, Wo)


class LayerNorm:
    def __init__(self, dim: int, eps: float = 1e-5, name: str = "norm"):
        self.dim = dim
        self.eps = eps
        self.name = name

    def init(self, key, dtype=None) -> dict:
        del key
        dtype = resolve_dtype(dtype)
        return {"weight": jnp.ones((self.dim,), dtype),
                "bias": jnp.zeros((self.dim,), dtype)}

    def apply(self, params: dict, x: jnp.ndarray, **_) -> jnp.ndarray:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        xhat = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return xhat * params["weight"] + params["bias"]


class BatchNorm:
    """Batch normalization over axis 0 using batch statistics.

    The reference's BatchNorm1d option (gnn/models/base_gnn.py:88-90) is used
    in full-graph training where every forward sees the whole graph, so batch
    statistics equal "running" statistics over the only batch there is.
    ``norms`` params are excluded from the Laplace posterior either way.
    """

    def __init__(self, dim: int, eps: float = 1e-5, name: str = "norm"):
        self.dim = dim
        self.eps = eps
        self.name = name

    def init(self, key, dtype=None) -> dict:
        del key
        dtype = resolve_dtype(dtype)
        return {"weight": jnp.ones((self.dim,), dtype),
                "bias": jnp.zeros((self.dim,), dtype)}

    def apply(self, params: dict, x: jnp.ndarray, **_) -> jnp.ndarray:
        mu = jnp.mean(x, axis=0, keepdims=True)
        var = jnp.var(x, axis=0, keepdims=True)
        xhat = (x - mu) * jax.lax.rsqrt(var + self.eps)
        return xhat * params["weight"] + params["bias"]


class Identity:
    name = "identity"

    def init(self, key, dtype=None) -> dict:
        del key, dtype
        return {}

    def apply(self, params, x, **_):
        del params
        return x


def make_norm(norm: Optional[str], dim: int, name: str = "norm"):
    if norm == "layer":
        return LayerNorm(dim, name=name)
    if norm == "batch":
        return BatchNorm(dim, name=name)
    if norm in (None, "none"):
        return Identity()
    raise ValueError(f"Unknown normalization type: {norm}")


def dropout(rng, x: jnp.ndarray, p: float, train: bool) -> jnp.ndarray:
    if not train or p <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


# ---------------------------------------------------------------------------
# Simple container models (used by the Laplace test-suite analog, mirroring
# the reference's toy MLPs in tests/utils.py)
# ---------------------------------------------------------------------------

class MLP:
    """Plain MLP: Linear -> act -> ... -> Linear, with KFAC taps on every
    Linear. ``params`` is ``{"layers": [layer_params, ...]}``."""

    def __init__(self, dims: Sequence[int], act: str = "tanh", bias: bool = True):
        self.dims = tuple(dims)
        self.act = activation_resolver(act)
        self.layers = [
            Linear(dims[i], dims[i + 1], bias=bias, name=f"layers.{i}")
            for i in range(len(dims) - 1)
        ]
        self.n_outputs = dims[-1]

    def init(self, key, dtype=None) -> dict:
        keys = jax.random.split(key, len(self.layers))
        return {"layers": [l.init(k, dtype) for l, k in zip(self.layers, keys)]}

    def apply(self, params: dict, x: jnp.ndarray,
              taps: Optional[TapCollector] = None,
              rng=None, train: bool = False) -> jnp.ndarray:
        del rng, train
        h = x
        for i, layer in enumerate(self.layers):
            h = layer.apply(params["layers"][i], h, taps=taps)
            if i < len(self.layers) - 1:
                h = self.act(h)
        return h

    # the final Linear's output IS the model output, so the closed-form
    # last-layer Jacobian (features x I) is exact
    last_layer_closed_form = True

    def features(self, params: dict, X) -> tuple:
        """(penultimate features, output) — FeatureExtractor analog
        (reference laplace/utils/feature_extractor.py:131-216), via taps."""
        taps = TapCollector()
        f = self.apply(params, X, taps=taps)
        last = self.layers[-1].name
        a = [a for (n, a, s) in taps.records if n == last][-1]
        return a, f

    # --- introspection used by Laplace / KFAC ---
    def tap_sites(self, params: dict) -> list[dict]:
        """Static description of KFAC-able sites in tap order:
        [{"name", "param_path", "has_bias"}]."""
        return [
            {"name": l.name, "param_path": ("layers", i), "has_bias": l.use_bias}
            for i, l in enumerate(self.layers)
        ]

    def last_layer_path(self, params: dict) -> tuple:
        return ("layers", len(self.layers) - 1)


class CNN:
    """Small Conv2d -> act -> ... -> flatten -> Linear classifier with KFAC
    taps on every conv and linear layer (the analog of the reference
    test-suite's conv models used by the curvature-backend cross-checks,
    tests/test_curv_backends_curvlinops.py).

    ``conv_specs``: sequence of (in_ch, out_ch, kernel_size) triples;
    ``head_in``/``n_outputs`` size the final Linear after flattening.
    """

    def __init__(self, conv_specs: Sequence[tuple], head_in: int,
                 n_outputs: int, act: str = "relu", bias: bool = True):
        self.act = activation_resolver(act)
        self.convs = [
            Conv2d(ci, co, k, bias=bias, name=f"convs.{i}")
            for i, (ci, co, k) in enumerate(conv_specs)
        ]
        self.head = Linear(head_in, n_outputs, bias=bias, name="head")
        self.n_outputs = n_outputs

    def init(self, key, dtype=None) -> dict:
        keys = jax.random.split(key, len(self.convs) + 1)
        return {
            "convs": [c.init(k, dtype) for c, k in zip(self.convs, keys)],
            "head": self.head.init(keys[-1], dtype),
        }

    def apply(self, params: dict, x: jnp.ndarray,
              taps: Optional[TapCollector] = None,
              rng=None, train: bool = False) -> jnp.ndarray:
        del rng, train
        h = x
        for i, conv in enumerate(self.convs):
            h = self.act(conv.apply(params["convs"][i], h, taps=taps))
        h = h.reshape(h.shape[0], -1)
        return self.head.apply(params["head"], h, taps=taps)

    last_layer_closed_form = True

    def features(self, params: dict, X) -> tuple:
        taps = TapCollector()
        f = self.apply(params, X, taps=taps)
        a = [a for (n, a, s) in taps.records if n == "head"][-1]
        return a, f

    def tap_sites(self, params: dict) -> list[dict]:
        sites = [
            {"name": c.name, "param_path": ("convs", i), "has_bias": c.use_bias}
            for i, c in enumerate(self.convs)
        ]
        sites.append({"name": "head", "param_path": ("head",),
                      "has_bias": self.head.use_bias})
        return sites

    def last_layer_path(self, params: dict) -> tuple:
        return ("head",)


def get_subtree(params: Any, path: tuple):
    node = params
    for p in path:
        node = node[p]
    return node


def set_subtree(params: Any, path: tuple, value):
    """Immutable set of a subtree at ``path`` in a nested dict/list pytree."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    if isinstance(params, dict):
        out = dict(params)
        out[head] = set_subtree(params[head], rest, value)
        return out
    if isinstance(params, (list, tuple)):
        out = list(params)
        out[head] = set_subtree(params[head], rest, value)
        return type(params)(out) if isinstance(params, tuple) else out
    raise TypeError(f"Cannot set path {path} in {type(params)}")


class DictInputModel:
    """Adapter making any module accept HF-style ``MutableMapping`` batches.

    The array stored under ``dict_key_x`` is the wrapped model's input;
    other keys (e.g. the targets under ``dict_key_y``) ride along and are
    ignored by the forward. This is the TPU build's counterpart of the
    reference's dict-input model support (laplace/baselaplace.py:77-82,
    dict-input fakes tests/utils.py:109-127, examples/huggingface_example.py)
    — there the *user's* model consumes the dict; here a wrapper does, so
    every existing module works with dict loaders unchanged. Plain-array
    inputs still pass through, matching the reference models' dual
    behavior.
    """

    def __init__(self, base, dict_key_x: str = "input_ids"):
        self.base = base
        self.dict_key_x = dict_key_x
        self.n_outputs = getattr(base, "n_outputs", None)
        self.last_layer_closed_form = getattr(base, "last_layer_closed_form",
                                              False)

    def _x(self, X):
        from collections.abc import MutableMapping
        if isinstance(X, MutableMapping):
            return X[self.dict_key_x]
        return X

    def init(self, key, dtype=None):
        return self.base.init(key, dtype)

    def apply(self, params, X, taps=None, rng=None, train=False):
        return self.base.apply(params, self._x(X), taps=taps, rng=rng,
                               train=train)

    __call__ = apply

    def features(self, params, X):
        return self.base.features(params, self._x(X))

    def tap_sites(self, params):
        return self.base.tap_sites(params)

    def last_layer_path(self, params):
        return self.base.last_layer_path(params)
