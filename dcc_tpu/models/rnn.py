"""Masked GRU layer (optional recurrent policy path).

Parity target: ``algos/algo_utils/rnn.py:7-80`` — ``recurrent_N``-layer GRU
whose hidden state is zeroed wherever the step mask is 0 (episode boundary),
followed by LayerNorm on the output. The reference has two call modes:

* single step (rollout): ``x:(B,H), hxs:(B,L,H), masks:(B,1)`` —
  ``rnn.py:25-30``
* sequence (training): ``x:(T*B,H)`` chunk-split at done boundaries —
  ``rnn.py:31-77``. Here the same math is a ``lax.scan`` over time applying
  the mask reset every step; the reference's boundary-splitting is just a
  host-side optimization of identical semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedGRU(nn.Module):
    hidden_size: int = 256
    recurrent_n: int = 1
    use_orthogonal: bool = True

    def setup(self):
        init = (
            nn.initializers.orthogonal()
            if self.use_orthogonal
            else nn.initializers.xavier_uniform()
        )
        self.cells = [
            nn.GRUCell(
                features=self.hidden_size,
                kernel_init=init,
                recurrent_kernel_init=init,
                bias_init=nn.initializers.zeros,
                name=f"gru{i}",
            )
            for i in range(self.recurrent_n)
        ]
        self.norm = nn.LayerNorm(name="norm")

    def _cell_step(self, x: jnp.ndarray, h: jnp.ndarray, mask: jnp.ndarray):
        """One time step through the stacked cells.

        x: (B, H) input; h: (B, L, H) hidden; mask: (B, 1)."""
        hs = []
        out = x
        for i, cell in enumerate(self.cells):
            hi = h[:, i] * mask  # zero hidden at episode starts (rnn.py:27)
            hi, out = cell(hi, out)
            hs.append(hi)
        return out, jnp.stack(hs, axis=1)

    def __call__(self, x: jnp.ndarray, h: jnp.ndarray, masks: jnp.ndarray):
        """Single rollout step. x:(B,H), h:(B,L,H), masks:(B,1) ->
        (normed output (B,H), new hidden (B,L,H))."""
        out, h = self._cell_step(x, h, masks)
        return self.norm(out), h

    def sequence(self, xs: jnp.ndarray, h0: jnp.ndarray, masks: jnp.ndarray):
        """Training-time sequence forward. xs:(T,B,H), h0:(B,L,H),
        masks:(T,B,1) -> (outputs (T,B,H) normed, final hidden).

        Equivalent to the reference's done-boundary chunk splitting
        (rnn.py:41-77): applying the mask reset at every step subsumes it.
        """
        h, outs = nn.scan(
            MaskedGRU._scan_body,
            variable_broadcast="params",
            split_rngs={"params": False},
        )(self, h0, (xs, masks))
        return self.norm(outs), h

    def _scan_body(self, h, inp):
        x_t, m_t = inp
        out, h = self._cell_step(x_t, h, m_t)
        return h, out
