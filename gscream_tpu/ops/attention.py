"""Bidirectional cross-attention (pure JAX).

Re-implementation of the ``bidirectional-cross-attention`` module the
reference instantiates at ``scene/gaussian_model.py:161-167``
(``BidirectionalCrossAttention(dim=32, heads=8, dim_head=64,
context_dim=32)``, pip package pinned in ``gscream.yaml:78``) and drives
from ``run_crossattn`` (gaussian_model.py:553-583): foreground (masked
region) anchor features attend to background anchor features and vice
versa through a *shared* similarity matrix — softmax over the context axis
for the sequence output and over the sequence axis for the context output.

With the reference's constructor defaults there is no pre-norm, no dropout
and no talking-heads, so the module is exactly:

    qk, v   = x Wqk,  x Wv              (no bias)
    cqk, cv = c Wcqk, c Wcv             (no bias)
    sim     = qk cqkᵀ · scale           (per head)
    out     = softmax_j(sim) cv Wo + bo
    ctx_out = softmax_i(sim)ᵀ v Wco + bco
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class BidirAttnParams(NamedTuple):
    to_qk: jnp.ndarray        # (dim, inner)
    ctx_to_qk: jnp.ndarray    # (context_dim, inner)
    to_v: jnp.ndarray         # (dim, inner)
    ctx_to_v: jnp.ndarray     # (context_dim, inner)
    to_out_w: jnp.ndarray     # (inner, dim)
    to_out_b: jnp.ndarray     # (dim,)
    ctx_out_w: jnp.ndarray    # (inner, context_dim)
    ctx_out_b: jnp.ndarray    # (context_dim,)
    heads: int                # static (pytree aux)
    dim_head: int             # static (pytree aux)

    def tree_flatten(self):
        return tuple(self[:8]), (self.heads, self.dim_head)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, heads=aux[0], dim_head=aux[1])


def init_bidirectional_attn(key, dim=32, heads=8, dim_head=64,
                            context_dim=None):
    context_dim = dim if context_dim is None else context_dim
    inner = heads * dim_head
    ks = jax.random.split(key, 6)

    def lin(k, fi, fo):
        bound = 1.0 / np.sqrt(fi)
        return jax.random.uniform(k, (fi, fo), jnp.float32, -bound, bound)

    return BidirAttnParams(
        to_qk=lin(ks[0], dim, inner),
        ctx_to_qk=lin(ks[1], context_dim, inner),
        to_v=lin(ks[2], dim, inner),
        ctx_to_v=lin(ks[3], context_dim, inner),
        to_out_w=lin(ks[4], inner, dim),
        to_out_b=jnp.zeros(dim),
        ctx_out_w=lin(ks[5], inner, context_dim),
        ctx_out_b=jnp.zeros(context_dim),
        heads=heads, dim_head=dim_head,
    )


def _split_heads(x, heads):
    n, inner = x.shape
    return x.reshape(n, heads, inner // heads).transpose(1, 0, 2)  # (h,n,d)


def bidirectional_attn(p: BidirAttnParams, x, context,
                       mask=None, context_mask=None):
    """x (N, dim), context (M, context_dim) → (out (N,dim), ctx_out (M,cd)).

    ``mask``/``context_mask`` are boolean validity masks; masked positions
    receive -inf similarity from the *other* side's softmax (padding
    support for fixed-capacity token blocks).
    """
    scale = p.dim_head ** -0.5
    qk = _split_heads(x @ p.to_qk, p.heads)            # (h,N,d)
    cqk = _split_heads(context @ p.ctx_to_qk, p.heads) # (h,M,d)
    v = _split_heads(x @ p.to_v, p.heads)
    cv = _split_heads(context @ p.ctx_to_v, p.heads)

    sim = jnp.einsum('hid,hjd->hij', qk, cqk) * scale  # (h,N,M)
    neg = jnp.finfo(sim.dtype).min
    if context_mask is not None:
        sim = jnp.where(context_mask[None, None, :], sim, neg)
    sim_i = sim
    if mask is not None:
        sim_i = jnp.where(mask[None, :, None], sim, neg)

    attn = jax.nn.softmax(sim, axis=-1)                # x attends context
    ctx_attn = jax.nn.softmax(sim_i, axis=-2)          # context attends x

    out = jnp.einsum('hij,hjd->hid', attn, cv)         # (h,N,d)
    ctx_out = jnp.einsum('hij,hid->hjd', ctx_attn, v)  # (h,M,d)

    out = out.transpose(1, 0, 2).reshape(x.shape[0], -1)
    ctx_out = ctx_out.transpose(1, 0, 2).reshape(context.shape[0], -1)
    return (out @ p.to_out_w + p.to_out_b,
            ctx_out @ p.ctx_out_w + p.ctx_out_b)
