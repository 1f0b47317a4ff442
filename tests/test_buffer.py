"""Ring-buffer tests: jit-safe append/wrap semantics and sampling masks."""

import jax
import jax.numpy as jnp
import numpy as np

from ergodic_exploration_tpu.ops.buffer import RingBuffer


def test_append_and_valid_mask():
    buf = RingBuffer.create(4)
    assert float(buf.valid_mask().sum()) == 0.0
    buf = buf.append(jnp.array([1.0, 2.0]))
    buf = buf.append(jnp.array([3.0, 4.0]))
    assert int(buf.count) == 2
    np.testing.assert_allclose(np.asarray(buf.positions[:2]), [[1, 2], [3, 4]])
    np.testing.assert_allclose(np.asarray(buf.valid_mask()), [1, 1, 0, 0])


def test_ring_wraps_and_overwrites_oldest():
    buf = RingBuffer.create(3)
    for i in range(5):
        buf = buf.append(jnp.array([float(i), 0.0]))
    assert int(buf.count) == 3
    # slots: [3, 4, 2] (cursor wrapped twice)
    got = sorted(float(v) for v in np.asarray(buf.positions[:, 0]))
    assert got == [2.0, 3.0, 4.0]
    np.testing.assert_allclose(np.asarray(buf.valid_mask()), [1, 1, 1])


def test_append_is_jittable():
    @jax.jit
    def push(buf, p):
        return buf.append(p)

    buf = RingBuffer.create(8)
    for i in range(10):
        buf = push(buf, jnp.array([float(i), -1.0]))
    assert int(buf.count) == 8


def test_sample_mask_full_concat():
    buf = RingBuffer.create(5)
    buf = buf.append(jnp.array([0.0, 0.0])).append(jnp.array([1.0, 1.0]))
    w = buf.sample_mask(None, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(w), [1, 1, 0, 0, 0])


def test_sample_mask_batch_counts():
    buf = RingBuffer.create(8)
    for i in range(3):
        buf = buf.append(jnp.array([float(i), 0.0]))
    w = buf.sample_mask(16, jax.random.PRNGKey(1))
    assert float(w.sum()) == 16.0
    assert float(w[3:].sum()) == 0.0  # only valid entries drawn


def test_sample_mask_empty_buffer_zero():
    buf = RingBuffer.create(4)
    w = buf.sample_mask(8, jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(w), 0.0)
