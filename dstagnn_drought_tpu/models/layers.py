"""Parameter initializers mirroring the reference's init scheme.

The reference re-initializes *every* parameter after construction
(model/DSTAGNN_my.py:292-296): ndim > 1 → xavier_uniform, ndim <= 1 →
``nn.init.uniform_`` i.e. U(0, 1) — including conv/linear biases and
LayerNorm scales/biases. That quirk shapes early training dynamics, so we
replicate it (with JAX PRNG rather than torch's RNG stream; exact-activation
parity is achieved by weight import, see ``import_torch_state_dict``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform(rng: np.random.Generator, shape, dtype=jnp.float32):
    """torch ``nn.init.xavier_uniform_`` (gain=1) fan computation: for conv
    weights (O, I, kh, kw), fan_in = I·kh·kw, fan_out = O·kh·kw."""
    if len(shape) < 2:
        raise ValueError("xavier_uniform needs ndim >= 2")
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jnp.asarray(rng.uniform(-bound, bound, shape), dtype)


def ref_uniform(rng: np.random.Generator, shape, dtype=jnp.float32):
    """torch ``nn.init.uniform_`` default U(0, 1)."""
    return jnp.asarray(rng.uniform(0.0, 1.0, shape), dtype)


def init_like_reference(rng, shape, dtype=jnp.float32):
    """Dispatch on ndim exactly like the reference's init loop."""
    if len(shape) > 1:
        return xavier_uniform(rng, shape, dtype)
    return ref_uniform(rng, shape, dtype)


class KeyGen:
    """Deterministic generator dispenser for traversal-ordered init.

    Host-side numpy RNG seeded from a JAX PRNG key: initialization is a
    one-time host task; routing it through per-parameter jitted jax.random
    calls costs ~100 XLA compilations (~1 min) for zero benefit.
    """

    def __init__(self, key):
        if hasattr(key, "dtype") and jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(key))
        else:
            data = np.asarray(key)
        seed = int.from_bytes(data.tobytes(), "little") % (2**63)
        self._rng = np.random.default_rng(seed)

    def __call__(self) -> np.random.Generator:
        return self._rng


def linear_params(kg: KeyGen, d_in: int, d_out: int, bias: bool = True):
    """Kernel stored (d_in, d_out): y = x @ w + b. torch stores (out, in);
    xavier bounds are symmetric in fan so layout doesn't change the init."""
    p = {"w": xavier_uniform(kg(), (d_out, d_in)).T}
    if bias:
        p["b"] = ref_uniform(kg(), (d_out,))
    return p


def conv2d_params(kg: KeyGen, c_out: int, c_in: int, kh: int, kw: int, bias: bool = True):
    p = {"w": xavier_uniform(kg(), (c_out, c_in, kh, kw))}
    if bias:
        p["b"] = ref_uniform(kg(), (c_out,))
    return p


def layer_norm_params(kg: KeyGen, dim: int):
    # Reference quirk: LN affine params are re-initialized U(0,1) by the
    # model-wide init loop (not ones/zeros).
    return {"scale": ref_uniform(kg(), (dim,)), "bias": ref_uniform(kg(), (dim,))}


def embedding_params(kg: KeyGen, nb_seq: int, d_em: int):
    return {"pos": xavier_uniform(kg(), (nb_seq, d_em))}
