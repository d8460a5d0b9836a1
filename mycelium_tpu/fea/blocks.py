"""Batched 3x3 block algebra as component-unrolled VPU math.

``jnp.einsum("nij,njk->nik")`` lowers to a batched ``dot_general`` whose
TPU layout tiles the 3x3 operand dims into (4,128)/(8,128) registers —
a measured 56.9x memory expansion per buffer: at 990k nodes one
(973713,3,3) f32 product costs 1.86 GB padded and the tree-PC
factorization asked the compiler for 31.85 G of 15.75 G HBM
(RESOURCE_EXHAUSTED at compile). Unrolling the contraction of size 3
into elementwise multiply-adds on (n,) component planes keeps every
buffer at its natural layout (batch dim on the lanes, ~1.3x padding)
and turns the op into pure VPU work — there is no MXU win to give up
at contraction size 3.

All products here are plain f32/f64 elementwise arithmetic, so they
are exact at the array dtype and need no ``Precision.HIGHEST`` escape
hatch (which the einsum forms required to avoid TPU bf16 passes).
"""

from __future__ import annotations

import jax.numpy as jnp


def mm3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched block product: (n,3,3) @ (n,3,3) -> (n,3,3)."""
    rows = []
    for i in range(3):
        rows.append(jnp.stack(
            [a[:, i, 0] * b[:, 0, k]
             + a[:, i, 1] * b[:, 1, k]
             + a[:, i, 2] * b[:, 2, k] for k in range(3)], axis=-1))
    return jnp.stack(rows, axis=1)


def mv3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched block-vector product: (n,3,3) x (n,3[,K]) -> (n,3[,K])."""
    if v.ndim == 2:
        return jnp.stack(
            [m[:, i, 0] * v[:, 0]
             + m[:, i, 1] * v[:, 1]
             + m[:, i, 2] * v[:, 2] for i in range(3)], axis=1)
    return jnp.stack(
        [m[:, i, 0, None] * v[:, 0]
         + m[:, i, 1, None] * v[:, 1]
         + m[:, i, 2, None] * v[:, 2] for i in range(3)], axis=1)


def mtv3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched transposed block-vector product: m^T v, (n,3[,K]) out."""
    if v.ndim == 2:
        return jnp.stack(
            [m[:, 0, i] * v[:, 0]
             + m[:, 1, i] * v[:, 1]
             + m[:, 2, i] * v[:, 2] for i in range(3)], axis=1)
    return jnp.stack(
        [m[:, 0, i, None] * v[:, 0]
         + m[:, 1, i, None] * v[:, 1]
         + m[:, 2, i, None] * v[:, 2] for i in range(3)], axis=1)
