"""BiLSTM query encoder — masked ``lax.scan``, static shapes.

Capability parity with the reference's packed-sequence
``nn.LSTM(300, 256, bidirectional=True)`` query encoder (SURVEY.md §2
item 7, §3.3): embeds token ids, runs forward and backward LSTM passes,
and returns the concatenated last-valid forward hidden state and
first-token backward hidden state — exactly what torch's
``pack_padded_sequence`` + final-hidden extraction produces, but with no
packing: sequences stay padded to ``max_qlen`` and a length mask freezes
the carry past each sequence's end (SURVEY.md §7 "hard parts" #2).

TPU notes: a single ``lax.scan`` over time with a (B, 4H) gate matmul per
step — the matmul is MXU work; scan keeps the program size O(1) in
sequence length. Gate ordering follows torch's (i, f, g, o) so the weight
converter is a pure reshape.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class LSTMDirection(nn.Module):
    """One direction of a masked LSTM over a padded (B, T, E) batch."""

    hidden: int
    reverse: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, lengths: Array) -> tuple[Array, Array]:
        """x: (B, T, E); lengths: (B,) int. Returns (outputs (B,T,H), last_h (B,H)).

        For the reverse direction the input is flipped within each valid
        prefix conceptually; we implement it by scanning the flipped padded
        sequence but masking so updates occur only on valid steps — the
        returned ``last_h`` then equals torch's backward final hidden (the
        state after reading token 0).
        """
        b, t, e = x.shape
        h = self.hidden
        # torch layout: weight_ih (4H, E), weight_hh (4H, H), gates (i,f,g,o).
        w_ih = self.param("w_ih", nn.initializers.lecun_normal(), (e, 4 * h), jnp.float32)
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (h, 4 * h), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (4 * h,), jnp.float32)

        xs = jnp.flip(x, axis=1) if self.reverse else x
        # valid-step mask per (t, B): for reverse, step i touches original
        # index T-1-i, valid iff T-1-i < len ⇔ i >= T - len.
        steps = jnp.arange(t)
        if self.reverse:
            step_valid = steps[:, None] >= (t - lengths)[None, :]  # (T, B)
        else:
            step_valid = steps[:, None] < lengths[None, :]

        x_proj = (xs.astype(jnp.float32) @ w_ih + bias).astype(jnp.float32)  # (B,T,4H)
        x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H) scan-major

        def step(carry, inp):
            h_prev, c_prev = carry
            gates_x, valid = inp
            gates = gates_x + h_prev @ w_hh  # (B, 4H)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c_new = f * c_prev + i * g
            h_new = o * jnp.tanh(c_new)
            m = valid[:, None].astype(jnp.float32)
            h_out = m * h_new + (1 - m) * h_prev
            c_out = m * c_new + (1 - m) * c_prev
            return (h_out, c_out), h_out

        init = (jnp.zeros((b, h), jnp.float32), jnp.zeros((b, h), jnp.float32))
        (last_h, _), outs = jax.lax.scan(step, init, (x_proj, step_valid))
        outs = jnp.swapaxes(outs, 0, 1)  # (B, T, H)
        if self.reverse:
            outs = jnp.flip(outs, axis=1)
        return outs.astype(self.dtype), last_h.astype(self.dtype)


class BiLSTMEncoder(nn.Module):
    """Token ids → single query vector (B, 2·hidden), reference-equivalent."""

    vocab_size: int
    emb_dim: int = 300
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, qvec: Array, qlens: Array) -> Array:
        """qvec: (B, T) int32 token ids (0 = pad); qlens: (B,) int32."""
        emb = nn.Embed(
            self.vocab_size, self.emb_dim, param_dtype=jnp.float32, name="embed"
        )(qvec)
        _, h_fwd = LSTMDirection(self.hidden, reverse=False, dtype=self.dtype, name="fwd")(emb, qlens)
        _, h_bwd = LSTMDirection(self.hidden, reverse=True, dtype=self.dtype, name="bwd")(emb, qlens)
        return jnp.concatenate([h_fwd, h_bwd], axis=-1)
