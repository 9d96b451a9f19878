"""Bond-tensor loss/gradient and local optimiser step — the training hot loop.

Replaces the reference's per-sample SIMD kron kernels
(loss_functions.jl:193-379 for KLD, :435-619 for MSE) with two batched
matmuls over the whole training set.  Per bond (lid, rid):

  P[n]        = le[n] (x) phi_l[n] (x) phi_r[n] (x) re[n]     (the "phi-tilde"
                of loss_functions.jl:264-296, before conjugation)
  yhat[n, c]  = sum BT[..., c] * conj(P[n])
  KLD:  loss  = mean_n -log |yhat[n, y_n]|^2                  (KLD_iter!, :302-320)
        grad[..., c] = -(1/Z_c) sum_{n: y_n=c} P[n] / conj(yhat[n, y_n])
                                                              (Loss_Grad_KLD, :322-432)
  MSE:  loss  = mean_n 0.5 * sum_c |yhat[n,c] - onehot|^2     (Loss_Grad_MSE, :561-619)
        grad[..., c] = (1/N) sum_n conj(P[n]) (yhat[n,c] - onehot[n,c])

Z_c = N (pooled) or the class count (train_classes_separately, :383-432).

The environments arrive *normalized per sample* with log-scales ``env_ls[n]``
(see ops/env.py).  The KLD gradient is exactly invariant to those scales
(phi-tilde and yhat carry the same factor, which cancels in phi-tilde/yhat);
the KLD loss adds back 2*env_ls.  The MSE path reconstructs true-scale yhat.

The sample axis n is the data-parallel axis: under shard_map the two einsums
below become local matmuls + one psum of the [chi*d, d*chi, C] gradient —
exactly one collective per bond update.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _lr_factors(le, re, phi_l, phi_r):
    """L[n, chi*d] = le (x) phi_l ;  R[n, d*chi] = phi_r (x) re  (unconjugated)."""
    N, chi = le.shape
    d = phi_l.shape[1]
    L = (le[:, :, None] * phi_l[:, None, :]).reshape(N, chi * d)
    R = (phi_r[:, :, None] * re[:, None, :]).reshape(N, d * chi)
    return L, R


def bond_yhat(BT: jnp.ndarray, le, re, phi_l, phi_r) -> jnp.ndarray:
    """Scaled yhat [N, C] for bond tensor BT [chi, d, d, chi, C]."""
    chi, d, _, _, C = BT.shape
    L, R = _lr_factors(le, re, phi_l, phi_r)
    BTm = BT.reshape(chi * d, d * chi, C)
    t = jnp.einsum("nx,xyc->nyc", jnp.conj(L), BTm)
    return jnp.einsum("nyc,ny->nc", t, jnp.conj(R))


def kld_loss_grad(BT: jnp.ndarray, le, re, phi_l, phi_r,
                  y_onehot: jnp.ndarray, class_weight: jnp.ndarray,
                  env_ls: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KLD loss and gradient.

    y_onehot: [N, C] one-hot class indicators (real dtype).
    class_weight: [N] per-sample weight (1/N pooled; 1/count[y_n] separate).
    env_ls: [N] summed log-scales of le and re."""
    chi, d, _, _, C = BT.shape
    L, R = _lr_factors(le, re, phi_l, phi_r)
    BTm = BT.reshape(chi * d, d * chi, C)
    t = jnp.einsum("nx,xyc->nyc", jnp.conj(L), BTm)
    yhat = jnp.einsum("nyc,ny->nc", t, jnp.conj(R))            # [N, C] scaled
    y_true = jnp.sum(yhat * y_onehot.astype(yhat.dtype), axis=1)
    abs2 = jnp.real(y_true) ** 2 + jnp.imag(y_true) ** 2
    loss = jnp.sum(class_weight * (-jnp.log(abs2) - 2.0 * env_ls))
    # u[n] = w_n / conj(yhat_scaled[n]): scale-invariant gradient weight
    u = (class_weight / jnp.conj(y_true)).astype(BT.dtype)
    Wc = y_onehot.astype(BT.dtype) * u[:, None]                # [N, C]
    RW = R[:, :, None] * Wc[:, None, :]                        # [N, d*chi, C]
    grad = -jnp.einsum("nx,nyc->xyc", L, RW)
    return loss, grad.reshape(BT.shape)


def mse_loss_grad(BT: jnp.ndarray, le, re, phi_l, phi_r,
                  y_onehot: jnp.ndarray, class_weight: jnp.ndarray,
                  env_ls: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MSE loss and gradient (pooled normalisation, reference :561-619).

    True-scale yhat is reconstructed as yhat_scaled * exp(env_ls); for a
    trained (normalized) MPS the scales are O(1)."""
    chi, d, _, _, C = BT.shape
    L, R = _lr_factors(le, re, phi_l, phi_r)
    BTm = BT.reshape(chi * d, d * chi, C)
    t = jnp.einsum("nx,xyc->nyc", jnp.conj(L), BTm)
    yhat_s = jnp.einsum("nyc,ny->nc", t, jnp.conj(R))
    scale = jnp.exp(env_ls).astype(yhat_s.real.dtype)          # [N]
    yhat = yhat_s * scale[:, None].astype(yhat_s.dtype)
    resid = yhat - y_onehot.astype(yhat.dtype)                 # [N, C]
    loss = 0.5 * jnp.sum(class_weight * jnp.sum(jnp.abs(resid) ** 2, axis=1))
    # grad = sum_n conj(P_true[n]) resid[n] w[n]; P_true = P_scaled * scale
    W = resid * (class_weight * scale)[:, None].astype(yhat.dtype)
    RW = jnp.conj(R)[:, :, None] * W[:, None, :]
    grad = jnp.einsum("nx,nyc->xyc", jnp.conj(L), RW)
    return loss, grad.reshape(BT.shape)


def mixed_loss_grad(BT: jnp.ndarray, le, re, phi_l, phi_r,
                    y_onehot: jnp.ndarray, class_weight: jnp.ndarray,
                    env_ls: jnp.ndarray, alpha: float = 5.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixed loss = KLD + alpha * MSE (the reference's :Mixed loss,
    loss_functions.jl:622-668, legacy-engine only there; alpha=5 default).

    The L/R Kronecker factors and the two yhat einsums — the expensive
    contractions — are computed once and shared by both parts."""
    chi, d, _, _, C = BT.shape
    L, R = _lr_factors(le, re, phi_l, phi_r)
    BTm = BT.reshape(chi * d, d * chi, C)
    t = jnp.einsum("nx,xyc->nyc", jnp.conj(L), BTm)
    yhat_s = jnp.einsum("nyc,ny->nc", t, jnp.conj(R))          # [N, C] scaled

    # KLD part (see kld_loss_grad)
    y_true = jnp.sum(yhat_s * y_onehot.astype(yhat_s.dtype), axis=1)
    abs2 = jnp.real(y_true) ** 2 + jnp.imag(y_true) ** 2
    l_kld = jnp.sum(class_weight * (-jnp.log(abs2) - 2.0 * env_ls))
    u = (class_weight / jnp.conj(y_true)).astype(BT.dtype)
    Wc = y_onehot.astype(BT.dtype) * u[:, None]
    g_kld = -jnp.einsum("nx,nyc->xyc", L, R[:, :, None] * Wc[:, None, :])

    # MSE part (see mse_loss_grad)
    scale = jnp.exp(env_ls).astype(yhat_s.real.dtype)
    yhat = yhat_s * scale[:, None].astype(yhat_s.dtype)
    resid = yhat - y_onehot.astype(yhat.dtype)
    l_mse = 0.5 * jnp.sum(class_weight * jnp.sum(jnp.abs(resid) ** 2, axis=1))
    W = resid * (class_weight * scale)[:, None].astype(yhat.dtype)
    g_mse = jnp.einsum("nx,nyc->xyc", jnp.conj(L),
                       jnp.conj(R)[:, :, None] * W[:, None, :])

    return (l_kld + alpha * l_mse,
            (g_kld + alpha * g_mse).reshape(BT.shape))


_LOSS_GRADS = {"KLD": kld_loss_grad, "MSE": mse_loss_grad,
               "MIXED": mixed_loss_grad}


def apply_update(BT: jnp.ndarray, le, re, phi_l, phi_r, y_onehot, class_weight,
                 env_ls, *, eta, loss: str = "KLD", bbopt: str = "TSGO",
                 update_iters: int = 1, rescale: Tuple[bool, bool] = (False, True),
                 axis_name: str = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimise one bond tensor (reference apply_update, loss_functions.jl:88-188).

    Optimisers: "GD" (fixed-step), "TSGO" (normalized-gradient step,
    loss_functions.jl:79), "CGD" (Polak-Ribiere nonlinear conjugate gradient
    with normalized step — the role of the reference's Optim/OptimKit CGD,
    which uses a line search instead of a fixed step).

    ``axis_name``: when running inside shard_map over a data-parallel mesh
    axis (batch operands are per-shard blocks), the local loss/gradient are
    psummed over that axis — the one collective per bond update — so BT
    stays replicated across shards.

    Returns (loss_before_last_step, BT_new)."""
    base_loss_grad = _LOSS_GRADS[loss]
    if axis_name is None:
        loss_grad = base_loss_grad
    else:
        def loss_grad(*a):
            l, g = base_loss_grad(*a)
            return (jax.lax.psum(l, axis_name),
                    jax.lax.psum(g, axis_name))

    if rescale[0]:
        BT = BT / jnp.linalg.norm(BT)

    eta_c = jnp.asarray(eta)

    if bbopt == "CGD":
        def step(carry, _):
            BT, g_prev, p_prev, _ = carry
            l, g = loss_grad(BT, le, re, phi_l, phi_r, y_onehot, class_weight,
                             env_ls)
            denom = jnp.maximum(jnp.real(jnp.vdot(g_prev, g_prev)),
                                jnp.finfo(g.real.dtype).tiny)
            beta = jnp.maximum(jnp.real(jnp.vdot(g, g - g_prev)) / denom, 0.0)
            has_prev = jnp.real(jnp.vdot(g_prev, g_prev)) > 0
            p = -g + jnp.where(has_prev, beta, 0.0).astype(g.dtype) * p_prev
            pn = p / jnp.maximum(jnp.linalg.norm(p),
                                 jnp.finfo(g.real.dtype).tiny)
            BT = BT + eta_c.astype(BT.dtype) * pn
            return (BT, g, p, l), None

        zero = jnp.zeros((), jnp.result_type(BT.real))
        (BT, _, _, last_loss), _ = jax.lax.scan(
            step, (BT, jnp.zeros_like(BT), jnp.zeros_like(BT), zero),
            None, length=update_iters)
    else:
        def step(carry, _):
            BT, _ = carry
            l, g = loss_grad(BT, le, re, phi_l, phi_r, y_onehot, class_weight,
                             env_ls)
            if bbopt == "TSGO":
                # TSGO: BT -= eta * grad / ||grad||   (loss_functions.jl:79)
                g = g / jnp.linalg.norm(g)
            BT = BT - eta_c.astype(BT.dtype) * g
            return (BT, l), None

        zero = jnp.zeros((), jnp.result_type(BT.real))
        (BT, last_loss), _ = jax.lax.scan(step, (BT, zero), None,
                                          length=update_iters)

    if rescale[1]:
        BT = BT / jnp.linalg.norm(BT)
    return last_loss, BT
