"""Shared channel-form Gauss-Newton term assembly.

Both NDT and GICP objectives reduce, per correspondence, to a weighted
quadratic ``coef * x^T S x`` linearized with the left-SE(3) point Jacobian
``J = [I | -skew(q)]``. Given per-pair channel arrays (any shape) this
assembles ``grad = sum coef * J^T a`` (with ``a = S x``) and
``H = sum coef * J^T S J`` without ever materializing [..., 3, 3] tensors —
tiny-minor-dim batched matmuls strand the TPU MXU, while these flat channel
ops run the VPU at full width.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def gn_terms_channels(
    coef,
    qx, qy, qz,
    ax, ay, az,
    s00, s01, s02, s11, s12, s22,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (grad f32[6], H f32[6,6]).

    coef: per-pair weight channels (zero for misses); q*: transformed point
    channels (broadcastable to coef); a* = S x channels; s**: symmetric S
    channels.
    """
    qx = jnp.broadcast_to(qx, coef.shape)
    qy = jnp.broadcast_to(qy, coef.shape)
    qz = jnp.broadcast_to(qz, coef.shape)

    # gradient: [ sum coef*a | sum coef*(q x a) ]
    grad = jnp.stack(
        [
            jnp.sum(coef * ax),
            jnp.sum(coef * ay),
            jnp.sum(coef * az),
            jnp.sum(coef * (qy * az - qz * ay)),
            jnp.sum(coef * (qz * ax - qx * az)),
            jnp.sum(coef * (qx * ay - qy * ax)),
        ]
    )

    # B = S K (K = skew(q)); H = [[S, -B], [-B^T(row-form), -K B]]
    b00 = s01 * qz - s02 * qy
    b10 = s11 * qz - s12 * qy
    b20 = s12 * qz - s22 * qy
    b01 = s02 * qx - s00 * qz
    b11 = s12 * qx - s01 * qz
    b21 = s22 * qx - s02 * qz
    b02 = s00 * qy - s01 * qx
    b12 = s01 * qy - s11 * qx
    b22 = s02 * qy - s12 * qx
    # H_ww = -K B, rows of K expanded
    w00 = qz * b10 - qy * b20
    w01 = qz * b11 - qy * b21
    w02 = qz * b12 - qy * b22
    w11 = qx * b21 - qz * b01
    w12 = qx * b22 - qz * b02
    w22 = qy * b02 - qx * b12

    def cs(v):
        return jnp.sum(coef * v)

    H = jnp.stack(
        [
            jnp.stack([cs(s00), cs(s01), cs(s02), -cs(b00), -cs(b01), -cs(b02)]),
            jnp.stack([cs(s01), cs(s11), cs(s12), -cs(b10), -cs(b11), -cs(b12)]),
            jnp.stack([cs(s02), cs(s12), cs(s22), -cs(b20), -cs(b21), -cs(b22)]),
            jnp.stack([-cs(b00), -cs(b10), -cs(b20), cs(w00), cs(w01), cs(w02)]),
            jnp.stack([-cs(b01), -cs(b11), -cs(b21), cs(w01), cs(w11), cs(w12)]),
            jnp.stack([-cs(b02), -cs(b12), -cs(b22), cs(w02), cs(w12), cs(w22)]),
        ]
    )
    return grad, H


def inv3x3_sym_channels(a00, a01, a02, a11, a12, a22, eps: float = 1e-12):
    """Closed-form inverse of symmetric 3x3 matrices in channel form.
    Returns the 6 channels of the (symmetric) inverse."""
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) < eps, eps, det)
    return (
        c00 * inv_det,
        c01 * inv_det,
        c02 * inv_det,
        c11 * inv_det,
        c12 * inv_det,
        c22 * inv_det,
    )
