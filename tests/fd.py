"""Centered finite-difference harness (reference runtests.jl:11-20)."""

import numpy as np


def centered_fd(f, u, du, h=1e-6):
    """(f(u + h du) - f(u - h du)) / (2h) — reference utils.jl:109."""
    u = np.asarray(u, dtype=float)
    du = np.asarray(du, dtype=float)
    return (np.asarray(f(u + h * du)) - np.asarray(f(u - h * du))) / (2 * h)


def fd_check(f, df, u, du, h=1e-6, rtol=1e-6, atol=1e-8):
    """Compare analytic directional derivative df(u)·du to centered FD."""
    fd = centered_fd(f, u, du, h)
    an = np.asarray(df(u, du))
    np.testing.assert_allclose(an, fd, rtol=rtol, atol=atol)
