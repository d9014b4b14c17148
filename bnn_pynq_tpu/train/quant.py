"""Straight-through-estimator quantizers (SURVEY.md C13 «bnn/src/training/
binary_net.py» equivalents, rebuilt with jax.custom_vjp).

Quantization grids (must stay consistent with the integer inference
conventions in the package docstring — the parameter compiler and the
engine rely on these exact boundary semantics):

- 1-bit: q = +1 if x >= 0 else -1 (boundary on the >= side, matching the
  integer `acc >= thr` epilogue; packing then stores bit = (q > 0)).
- 2-bit: levels {-1, -1/3, +1/3, +1}; code c = clip(floor((3x+5)/2), 0, 3)
  i.e. round-half-up of (3x+3)/2, giving decision boundaries at
  x ∈ {-2/3, 0, +2/3} with the upper level taken at the boundary —
  exactly the `acc >= thr` (ceil) semantics the compiler folds into
  integer thresholds.

Backward: hard-tanh STE — pass gradient where |x| <= 1, zero outside
(the reference's `binary_tanh_unit` clipped STE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ste_bwd_mask(x, g):
    return jnp.where(jnp.abs(x) <= 1.0, g, 0.0)


@jax.custom_vjp
def binarize(x):
    """±1 deterministic binarization with hard-tanh STE.

    x >= 0 → +1 (NOT x > 0): matches the `acc >= thr` comparison the
    compiler folds batch-norm into, so training and integer inference
    agree exactly on the boundary."""
    return jnp.where(x >= 0, 1.0, -1.0).astype(x.dtype)


def _binarize_fwd(x):
    return binarize(x), x


def _binarize_bwd(x, g):
    return (_ste_bwd_mask(x, g),)


binarize.defvjp(_binarize_fwd, _binarize_bwd)


@jax.custom_vjp
def quantize2(x):
    """2-bit quantization to {-1,-1/3,1/3,1} with hard-tanh STE.

    Uses floor(v + 0.5) (round half UP) — NOT jnp.round's half-to-even —
    so boundaries land exactly on the >= semantics of integer thresholds.
    """
    c = jnp.clip(jnp.floor((3.0 * x + 3.0) / 2.0 + 0.5), 0.0, 3.0)
    return ((2.0 * c - 3.0) / 3.0).astype(x.dtype)


def _quantize2_fwd(x):
    return quantize2(x), x


def _quantize2_bwd(x, g):
    return (_ste_bwd_mask(x, g),)


quantize2.defvjp(_quantize2_fwd, _quantize2_bwd)


@jax.custom_vjp
def _binarize_stochastic(x, u):
    """Stochastic binarization: P(+1) = hard_sigmoid((x+1)/2), u ~ U[0,1).
    The reference's stochastic=True training mode («binary_net.py»)."""
    p = jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)
    return jnp.where(u < p, 1.0, -1.0).astype(x.dtype)


def _bin_sto_fwd(x, u):
    return _binarize_stochastic(x, u), x


def _bin_sto_bwd(x, g):
    return (_ste_bwd_mask(x, g), None)


_binarize_stochastic.defvjp(_bin_sto_fwd, _bin_sto_bwd)


def binarize_stochastic(x, key):
    return _binarize_stochastic(x, jax.random.uniform(key, x.shape))


def quantize_weights(w, wbits: int):
    """Weight quantizer used in the forward pass of training."""
    if wbits == 1:
        return binarize(w)
    if wbits == 2:
        return quantize2(w)
    raise ValueError(f"unsupported wbits={wbits}")


def quantize_activations(x, abits: int):
    if abits == 1:
        return binarize(x)
    if abits == 2:
        return quantize2(x)
    raise ValueError(f"unsupported abits={abits}")


def weight_levels(wq, wbits: int):
    """Float quantized weights → integer levels (for the param compiler).

    wbits=1: ±1.0 → ±1;  wbits=2: {-1,-1/3,1/3,1} → {-3,-1,1,3}."""
    import numpy as np
    wq = np.asarray(wq, dtype=np.float64)
    if wbits == 1:
        return np.where(wq > 0, 1, -1).astype(np.int8)
    return np.rint(wq * 3).astype(np.int8)
