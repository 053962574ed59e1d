"""Exact DP lifted cover cuts (mip/cuts.py _exact_cover_on_row)."""

import itertools

import numpy as np

from ortools_tpu.mip.cuts import _cover_on_row, _exact_cover_on_row


def test_exact_lifted_covers_valid_brute_force():
    """No integer-feasible point of the row is cut off (400 random
    integer-weight rows with mixed signs, full 2^n enumeration)."""
    rng = np.random.default_rng(0)
    produced = 0
    for _ in range(400):
        n = int(rng.integers(4, 10))
        w = rng.integers(1, 25, size=n).astype(float)
        sgn = np.where(rng.random(n) < 0.3, -1.0, 1.0)
        val = w * sgn
        rhs = float(rng.uniform(0.2, 0.8) * np.abs(val).sum()
                    + val[val < 0].sum())
        x = rng.random(n)
        idx = np.arange(n)
        out = _exact_cover_on_row(idx, val, rhs, np.zeros(n), np.ones(n),
                                  np.ones(n, dtype=bool), x, 1e-6)
        if out is None:
            continue
        produced += 1
        cidx, g, d = out
        for bits in itertools.product([0, 1], repeat=n):
            xb = np.array(bits, dtype=float)
            if val @ xb <= rhs + 1e-9:
                assert g @ xb[cidx] <= d + 1e-7, (val, rhs, cidx, g, d, xb)
    assert produced >= 50


def test_exact_cover_at_least_as_violated_as_greedy():
    """On integer rows the exact separation finds a cut whenever the
    greedy one does, with violation >= greedy's (same LP point)."""
    rng = np.random.default_rng(3)
    wins = both = 0
    for _ in range(200):
        n = int(rng.integers(6, 14))
        val = rng.integers(1, 30, size=n).astype(float)
        rhs = float(np.floor(rng.uniform(0.3, 0.7) * val.sum()))
        x = np.clip(rng.random(n) * 1.2, 0, 1)
        idx = np.arange(n)
        args = (idx, val, rhs, np.zeros(n), np.ones(n),
                np.ones(n, dtype=bool), x, 1e-6)
        ge = _cover_on_row(*args)
        ex = _exact_cover_on_row(*args)
        if ge is None:
            continue
        both += 1
        assert ex is not None, "exact missed a greedy-found cut"

        def viol(out):
            cidx, g, d = out
            return (float(g @ x[cidx]) - d) / max(np.linalg.norm(g), 1e-12)

        if viol(ex) >= viol(ge) - 1e-9:
            wins += 1
    assert both >= 30
    assert wins >= 0.9 * both
