"""Golden-value regression helpers: deterministic fingerprints of model
forwards under fixed seeds.

Each fingerprint stores summary statistics plus a strided sample of the
output tensor — small enough to commit, sensitive enough to catch semantic
drift (layout bugs, init changes, fused-path divergence) across rounds.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.npz")


def fingerprint(arr: jnp.ndarray, sample: int = 64) -> np.ndarray:
    """Deterministic small fingerprint of a tensor."""
    a = np.asarray(arr, np.float64).ravel()
    stride = max(len(a) // sample, 1)
    picked = a[::stride][:sample]
    stats = np.array([a.mean(), a.std(), np.abs(a).max(), float(len(a))])
    return np.concatenate([stats, picked])


def model_fingerprint(model, input_shape=(2, 256, 3), seed=0, **apply_kw):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.standard_normal(input_shape).astype(np.float32) * 0.2)
    variables = model.init(jax.random.key(seed), xyz, train=False, **apply_kw)
    out = model.apply(variables, xyz, train=False, **apply_kw)
    leaves = [x for x in jax.tree.leaves(out) if x is not None]
    return np.concatenate([fingerprint(leaf) for leaf in leaves])


def load_goldens() -> dict:
    if not os.path.exists(GOLDEN_PATH):
        return {}
    with np.load(GOLDEN_PATH) as z:
        return dict(z)


def save_goldens(goldens: dict) -> None:
    np.savez_compressed(GOLDEN_PATH, **goldens)
