"""SwapAlign2Nat (reference: projects/TensorMask/tensormask/layers/csrc/
SwapAlign2Nat/*.cu, ~350 LoC CUDA; wrapper layers/swap_align2nat.py).

The op converts the *aligned* mask representation U(u, v, y, x) — the mask
value at pixel (y + (u - V/2)·r, x + (v - V/2)·r) for the window centered at
(y, x) — to the *natural* representation N(u, v, y, x) — the mask value AT
pixel (y, x) for the window centered at (y - (u - V/2)·r·λ, ...), with a
bilinear λ upscale. In JAX this is one vectorized bilinear gather; the CUDA
kernel's backward comes for free via autodiff.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("lambda_val", "pad_val"))
def swap_align2nat(x: Array, lambda_val: int = 1, pad_val: float = -6.0) -> Array:
    """x: (N, V, V, H, W) aligned -> (N, V, V, H*λ, W*λ) natural."""
    n, v, _, h, w = x.shape
    oh, ow = h * lambda_val, w * lambda_val
    half = (v - 1) / 2.0

    u_idx = jnp.arange(v)
    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)

    # center position (in input resolution) whose window covers output (y, x)
    # at offset (u, v): c = y/λ - (u - half)
    cy = ys[None, :] / lambda_val - (u_idx[:, None] - half)  # (V, OH)
    cx = xs[None, :] / lambda_val - (u_idx[:, None] - half)  # (V, OW)

    def prep(c, size):
        oob = (c < 0) | (c > size - 1)
        cc = jnp.clip(c, 0.0, size - 1.0)
        lo = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, max(size - 2, 0))
        frac = cc - lo
        return lo, frac, oob

    ylo, yfrac, y_oob = prep(cy, h)  # (V, OH)
    xlo, xfrac, x_oob = prep(cx, w)  # (V, OW)

    # gather: out[n, u, vv, y, x] = bilerp(x[n, u, vv], cy[u, y], cx[vv, x])
    def sample(img, u, vv):
        # img: (H, W)
        yl = ylo[u]  # (OH,)
        xl = xlo[vv]  # (OW,)
        fy = yfrac[u][:, None]
        fx = xfrac[vv][None, :]
        v00 = img[yl[:, None], xl[None, :]]
        v01 = img[yl[:, None], jnp.clip(xl + 1, 0, w - 1)[None, :]]
        v10 = img[jnp.clip(yl + 1, 0, h - 1)[:, None], xl[None, :]]
        v11 = img[jnp.clip(yl + 1, 0, h - 1)[:, None], jnp.clip(xl + 1, 0, w - 1)[None, :]]
        out = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx + v10 * fy * (1 - fx) + v11 * fy * fx
        oob = y_oob[u][:, None] | x_oob[vv][None, :]
        return jnp.where(oob, pad_val, out)

    uu = jnp.arange(v)
    out = jax.vmap(  # over batch
        lambda img_n: jax.vmap(  # over u
            lambda u: jax.vmap(lambda vv: sample(img_n[u, vv], u, vv))(uu)
        )(uu)
    )(x)
    return out
