"""HF-style dict-input models: Laplace over an LLM-like classifier head.

Analog of the reference's examples/huggingface_example.py (offline): a
model consuming ``MutableMapping`` batches ``{"input_ids", "attention_mask",
"labels"}`` — here a small embedding + masked mean-pool + MLP head standing
in for a frozen transformer encoder — gets a last-layer Kron Laplace
posterior fit directly on dict loaders. ``dict_key_x``/``dict_key_y``
(reference laplace/baselaplace.py:77-82) name the input/target keys; the
DictInputModel adapter gives every module the same dual plain-array/dict
behavior the reference's HF wrappers have.
"""

import jax
import jax.numpy as jnp
import numpy as np

from laplace_gnn_tpu import Laplace
from laplace_gnn_tpu.nn import MLP, TapCollector
from laplace_gnn_tpu.utils.data import ArrayLoader

VOCAB, SEQ, DIM, C = 50, 12, 16, 3


class TokenClassifier:
    """Embedding -> masked mean pool -> MLP head, taking HF-style dicts."""

    def __init__(self):
        self.head = MLP([DIM, 32, C], act="tanh")
        self.n_outputs = C
        self.last_layer_closed_form = True

    def init(self, key, dtype=None):
        k1, k2 = jax.random.split(key)
        return {"embed": 0.1 * jax.random.normal(k1, (VOCAB, DIM)),
                "head": self.head.init(k2, dtype)}

    def _pool(self, params, batch):
        tok = params["embed"][batch["input_ids"]]        # (B, S, DIM)
        mask = batch["attention_mask"][..., None].astype(tok.dtype)
        return (tok * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)

    def apply(self, params, batch, taps=None, rng=None, train=False):
        return self.head.apply(params["head"], self._pool(params, batch),
                               taps=taps)

    __call__ = apply

    def features(self, params, batch):
        taps = TapCollector()
        f = self.apply(params, batch, taps=taps)
        last = self.head.layers[-1].name
        a = [a for (n, a, s) in taps.records if n == last][-1]
        return a, f

    def tap_sites(self, params):
        return [{**s, "param_path": ("head",) + s["param_path"]}
                for s in self.head.tap_sites(params["head"])]

    def last_layer_path(self, params):
        return ("head",) + self.head.last_layer_path(params["head"])


def main():
    rng = np.random.default_rng(0)
    n = 96
    ids = rng.integers(1, VOCAB, (n, SEQ))
    lengths = rng.integers(4, SEQ + 1, n)
    mask = (np.arange(SEQ)[None] < lengths[:, None]).astype(np.float32)
    ids = ids * mask.astype(ids.dtype)
    # labels depend on which vocab band dominates the (unmasked) tokens
    y = (np.array([np.bincount(r[r > 0] * C // VOCAB, minlength=C).argmax()
                   for r in ids])).astype(np.int64)

    data = {"input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask),
            "labels": jnp.asarray(y)}
    model = TokenClassifier()
    params = model.init(jax.random.PRNGKey(0))

    import optax
    opt = optax.adam(5e-2)
    st = opt.init(params)

    @jax.jit
    def step(p, s):
        def obj(p):
            logits = model.apply(p, data)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, data["labels"]).mean()
        l, g = jax.value_and_grad(obj)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, l

    for _ in range(300):
        params, st, loss = step(params, st)
    acc = float((model.apply(params, data).argmax(-1) ==
                 data["labels"]).mean())
    print(f"MAP train loss {float(loss):.3f} acc {acc:.2f}")

    # fit on MutableMapping batches directly — no unpacking anywhere
    loader = ArrayLoader(data, batch_size=32)
    la = Laplace(model, params, "classification",
                 subset_of_weights="last_layer", hessian_structure="kron")
    la.fit(loader)
    la.optimize_prior_precision(method="marglik", n_steps=50)
    print(f"marglik after tuning: {float(la.log_marginal_likelihood()):.2f}")

    probs = la({"input_ids": data["input_ids"][:8],
                "attention_mask": data["attention_mask"][:8]},
               pred_type="glm", link_approx="probit")
    print("dict-input Bayesian predictive:", np.round(np.asarray(probs), 3))
    assert np.allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    print("dict-input predictive sums to 1: OK")


if __name__ == "__main__":
    main()
