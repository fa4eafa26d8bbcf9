"""Recurrent (GRU) layer with mask-based hidden resets.

Parity target: ``harl/models/base/rnn.py`` — a ``recurrent_n``-layer GRU with
orthogonal weights / zero biases and a LayerNorm on outputs. The reference has
two forward paths: a single-step path for rollout (rnn.py:24-32) and a
segment-batched path for training over flattened (T·N) sequences (rnn.py:33-78)
whose zero-mask-splitting trick exists only to work around cuDNN's fused GRU.
On TPU we express both as a ``lax.scan`` over time with ``h ← h · mask_t``
applied before each step — mathematically identical, and XLA fuses the scan
body into one program.

GRU math follows the torch convention (nn.GRU):
    r = σ(x Wir + bir + h Whr + bhr)
    z = σ(x Wiz + biz + h Whz + bhz)
    n = tanh(x Win + bin + r ⊙ (h Whn + bhn))
    h' = (1 − z) ⊙ n + z ⊙ h

Weights are stored as fused (in_dim, 3H) / (H, 3H) matrices so each step is two
MXU matmuls per layer. Hidden-state layout matches the reference buffers:
(N, recurrent_n, hidden).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class GRUStack(nn.Module):
    hidden_size: int
    recurrent_n: int = 1

    @nn.compact
    def __call__(self, x, h, masks, seq: bool = False):
        """seq=False: x (N, d), masks (N, 1) → (out (N, H), h (N, L, H)).
        seq=True:  x (T, N, d), masks (T, N, 1) → (out (T, N, H), h (N, L, H))."""
        H = self.hidden_size
        orth = nn.initializers.orthogonal()
        params = []
        in_dim = x.shape[-1]
        for i in range(self.recurrent_n):
            wi = self.param(f"wi{i}", orth, (in_dim, 3 * H))
            wh = self.param(f"wh{i}", orth, (H, 3 * H))
            bi = self.param(f"bi{i}", nn.initializers.zeros, (3 * H,))
            bh = self.param(f"bh{i}", nn.initializers.zeros, (3 * H,))
            params.append((wi, wh, bi, bh))
            in_dim = H

        def cell(xt, ht, wi, wh, bi, bh):
            gi = xt @ wi + bi
            gh = ht @ wh + bh
            i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            z = jax.nn.sigmoid(i_z + h_z)
            n = jnp.tanh(i_n + r * h_n)
            return (1.0 - z) * n + z * ht

        def step(xt, ht, mt) -> Tuple[jnp.ndarray, jnp.ndarray]:
            ht = ht * mt[..., None]  # reset hidden where mask==0 (rnn.py:27)
            layers = []
            inp = xt
            for i in range(self.recurrent_n):
                h_i = cell(inp, ht[:, i], *params[i])
                layers.append(h_i)
                inp = h_i
            return inp, jnp.stack(layers, axis=1)

        if not seq:
            out, h = step(x, h, masks)
        else:
            def body(carry, xs):
                xt, mt = xs
                o, new_h = step(xt, carry, mt)
                return new_h, o

            h, out = jax.lax.scan(body, h, (x, masks))

        return nn.LayerNorm(name="norm")(out), h
