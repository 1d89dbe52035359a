"""Sinusoidal positional encoding.

Semantics match the reference encoder (/root/reference/src/models.py:6-54):
``gamma(x) = [x, sin(2^0 x), cos(2^0 x), ..., sin(2^(L-1) x), cos(2^(L-1) x)]``
with the input prepended when ``include_input``.  Feature order is load-bearing
because it defines the column layout of the first MLP weight matrix.

Implemented as one broadcast multiply + sin/cos + reshape rather than a Python
loop of concats: XLA fuses it into the consumer matmul and the VPU does the
transcendentals in a single pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def encoding_output_dim(input_dim: int, num_frequencies: int, include_input: bool = True) -> int:
    """Output feature dim (reference src/models.py:49-54)."""
    out = input_dim * 2 * num_frequencies
    if include_input:
        out += input_dim
    return out


def positional_encoding(x: jnp.ndarray, num_frequencies: int, include_input: bool = True) -> jnp.ndarray:
    """Encode ``x`` of shape (..., D) to (..., D * (2L + include_input)).

    Order per frequency is [sin(f x), cos(f x)] over all D dims, matching the
    reference's concat loop (src/models.py:39-44).
    """
    if num_frequencies == 0:
        return x if include_input else x[..., :0]
    # (L,) frequencies 2^0 .. 2^(L-1)
    freqs = 2.0 ** jnp.arange(num_frequencies, dtype=x.dtype)
    # (..., L, D)
    scaled = x[..., None, :] * freqs[:, None]
    # (..., L, 2, D): sin first then cos, matching the reference func order
    sc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-2)
    flat = sc.reshape(*x.shape[:-1], num_frequencies * 2 * x.shape[-1])
    if include_input:
        return jnp.concatenate([x, flat], axis=-1)
    return flat
