"""Compensated f32 reductions (ops/df32.py): accuracy vs f64 ground truth
on cancellation-heavy inputs."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ortools_tpu.ops.df32 import dot2, sum2, sum_df32, two_prod, two_sum, \
    vdot_df32


def test_two_sum_exact():
    import jax.numpy as jnp
    a = jnp.float32(1e8)
    b = jnp.float32(1.25)
    s, e = two_sum(a, b)
    assert float(s) + float(e) == 1e8 + 1.25


def test_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=64), jnp.float32)
    b = jnp.asarray(rng.normal(size=64), jnp.float32)
    p, e = two_prod(a, b)
    exact = np.float64(np.asarray(a, np.float64)) * np.asarray(b, np.float64)
    got = np.asarray(p, np.float64) + np.asarray(e, np.float64)
    np.testing.assert_allclose(got, exact, rtol=0, atol=0)


@pytest.mark.parametrize("n", [3, 1000, 4097])
def test_sum_df32_beats_plain_f32(n):
    rng = np.random.default_rng(1)
    # cancellation-heavy: big alternating values + small signal
    x = rng.normal(size=n) * 1e4
    x[::2] *= -1
    x += rng.normal(size=n) * 1e-3
    xf = jnp.asarray(x, jnp.float32)
    exact = float(np.sum(np.asarray(xf, np.float64)))
    comp = float(sum_df32(xf))
    plain = float(jnp.sum(xf))
    assert abs(comp - exact) <= max(1e-6 * abs(exact), 1e-4)
    assert abs(comp - exact) <= abs(plain - exact) + 1e-7


def test_vdot_df32_accuracy():
    rng = np.random.default_rng(2)
    n = 20000
    x = jnp.asarray(rng.normal(size=n) * 100, jnp.float32)
    y = jnp.asarray(rng.normal(size=n) * 100, jnp.float32)
    exact = float(np.asarray(x, np.float64) @ np.asarray(y, np.float64))
    comp = float(vdot_df32(x, y))
    plain = float(jnp.vdot(x, y))
    assert abs(comp - exact) <= abs(plain - exact) + 1e-6 * abs(exact) + 1e-6
    assert abs(comp - exact) <= 1e-5 * (1 + abs(exact))
