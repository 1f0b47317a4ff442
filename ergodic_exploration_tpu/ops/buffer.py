"""Trajectory-history replay buffer (jit-safe ring buffer).

Reference capability: ``ReplayBuffer`` (``buffer.hpp``): bounded store of
visited states, appended each tick, sampled and concatenated with the
predicted trajectory before computing c_k — so the time-average includes
history and the robot does not re-cover visited space (SURVEY.md sections 2
L3 and 3).

TPU-first (SURVEY.md section 8 "replay buffer under jit"): fixed capacity +
write cursor + validity mask — no dynamic shapes anywhere. Two history modes
are exposed via the controller config:

- ``ring``: reference-parity bounded window (forgets once full).
- ``accumulate``: running sum of basis values over ALL visited states — an
  O(K^2)-per-append exact c_k with unbounded effective history; the
  TPU-native fast path (no per-solve O(capacity K^2) reduction).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RingBuffer(NamedTuple):
    states: jnp.ndarray  # (capacity, 2) visited positions
    cursor: jnp.ndarray  # () int32: next write slot
    count: jnp.ndarray  # () int32: number of valid entries (<= capacity)

    @staticmethod
    def create(capacity: int) -> "RingBuffer":
        return RingBuffer(
            states=jnp.zeros((capacity, 2), dtype=jnp.float32),
            cursor=jnp.zeros((), dtype=jnp.int32),
            count=jnp.zeros((), dtype=jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.states.shape[0]

    def append(self, p) -> "RingBuffer":
        """Append one visited position (2,); overwrites oldest when full.

        One-hot blend instead of dynamic_update_slice: XLA lowers batched
        dynamic updates with traced offsets to the slow TPU scatter path,
        while the blend is pure elementwise work (round-1 profiling)."""
        cap = self.capacity
        hot = (jnp.arange(cap) == self.cursor)[:, None]  # (cap, 1)
        states = jnp.where(hot, p[None, :2], self.states)
        return RingBuffer(
            states=states,
            cursor=(self.cursor + 1) % cap,
            count=jnp.minimum(self.count + 1, cap),
        )

    def valid_mask(self):
        """(capacity,) float mask of live entries."""
        idx = jnp.arange(self.capacity)
        return (idx < self.count).astype(jnp.float32)

    def sample_mask(self, batch: Optional[int], rng) -> jnp.ndarray:
        """Weights (capacity,) for the c_k history term.

        ``batch=None``: every valid entry, weight 1 (full concat). Otherwise
        a with-replacement batch of ``batch`` valid entries is drawn
        (reference open question Q4 — both behaviors supported) and weights
        are multiplicities so downstream stays fixed-shape.
        """
        mask = self.valid_mask()
        if batch is None:
            return mask
        cap = self.capacity
        # draw `batch` indices uniformly from [0, count); empty buffer -> no weight
        u = jax.random.uniform(rng, (batch,))
        idx = jnp.floor(u * jnp.maximum(self.count, 1).astype(u.dtype)).astype(jnp.int32)
        # multiplicity counts via comparison-reduce, NOT scatter-add:
        # .at[idx].add lowers to the slow TPU scatter path under vmap, the
        # (batch, cap) comparison fuses into one elementwise+reduce loop.
        counts = jnp.sum(
            (idx[:, None] == jnp.arange(cap)[None, :]).astype(jnp.float32), axis=0
        )
        return jnp.where(self.count > 0, counts, jnp.zeros(cap))

    def sample_states(self, batch: int, rng):
        """With-replacement batch of states, COMPACTED to (batch, 2).

        Same draw as :meth:`sample_mask` (identical indices for identical
        rng), but returns the sampled states themselves via a one-hot
        matmul — downstream per-state work (basis tables) then runs on
        ``batch`` rows instead of ``capacity`` rows, the hot-path win when
        batch << capacity. Returns (states (batch, 2), n_valid ()).
        """
        cap = self.capacity
        u = jax.random.uniform(rng, (batch,))
        idx = jnp.floor(u * jnp.maximum(self.count, 1).astype(u.dtype)).astype(jnp.int32)
        onehot = (idx[:, None] == jnp.arange(cap)[None, :]).astype(jnp.float32)
        states = jnp.matmul(onehot, self.states, precision=jax.lax.Precision.HIGHEST)
        n = jnp.where(self.count > 0, jnp.float32(batch), 0.0)
        return states, n
