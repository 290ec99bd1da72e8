"""Synthetic test-function suite (JAX, differentiable).

Re-design of `/root/reference/testfns.jl` (~40 constructors). Every
function is a pure jnp expression; gradients come from `jax.grad`, which
also supplies *exact* gradients for the functions whose reference
gradients are `zeros` TODO stubs (testfns.jl:385,396,407,418,429,440,451,
487,523,559).

Functions take a (d,) vector; `TestFunction.batch` vmaps over (N, d).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TestFunction", "get_function", "FUNCTION_REGISTRY", "tplot"]


@dataclasses.dataclass(frozen=True)
class TestFunction:
    """dim/bounds/xopt/f/grad container (reference testfns.jl:5-11)."""

    dim: int
    bounds: np.ndarray          # (dim, 2)
    xopt: tuple                 # tuple of optimizer locations
    f: Callable[[jax.Array], jax.Array]

    def __call__(self, x):
        return self.f(jnp.asarray(x))

    def grad(self, x):
        return jax.grad(self.f)(jnp.asarray(x))

    def batch(self, X):
        return jax.vmap(self.f)(jnp.asarray(X))

    def batch_grad(self, X):
        return jax.vmap(jax.grad(self.f))(jnp.asarray(X))

    @property
    def lbs(self) -> np.ndarray:
        return self.bounds[:, 0]

    @property
    def ubs(self) -> np.ndarray:
        return self.bounds[:, 1]

    @property
    def fmin(self) -> float:
        return float(min(float(self.f(jnp.asarray(x, dtype=float))) for x in self.xopt))

    # -- combinators (testfns.jl:42-94) ------------------------------------
    def __add__(self, other: "TestFunction") -> "TestFunction":
        assert self.dim == other.dim
        return TestFunction(self.dim, _collapse_bounds(self, other), (np.zeros(self.dim),),
                            lambda x: self.f(x) + other.f(x))

    def __mul__(self, other: "TestFunction") -> "TestFunction":
        assert self.dim == other.dim
        return TestFunction(self.dim, _collapse_bounds(self, other), (np.zeros(self.dim),),
                            lambda x: self.f(x) * other.f(x))

    def scalar_scale(self, s: float) -> "TestFunction":
        return TestFunction(self.dim, self.bounds * s,
                            tuple(np.asarray(x) * s for x in self.xopt),
                            lambda x: self.f(x / s))

    def vshift(self, s: float) -> "TestFunction":
        return TestFunction(self.dim, self.bounds, self.xopt, lambda x: self.f(x) + s)

    def hshift(self, s) -> "TestFunction":
        s = np.asarray(s)
        return TestFunction(self.dim, self.bounds,
                            tuple(np.asarray(x) + s for x in self.xopt),
                            lambda x: self.f(x + jnp.asarray(s)))


def tplot(t: TestFunction, *, num_points: int = 200, ax=None, levels: int = 30):
    """Plot a 1-D curve or 2-D contour of a test function.

    reference: tplot (testfns.jl:99-114). matplotlib is imported lazily so
    the package has no hard plotting dependency; raises for dim > 2 like
    the reference.
    """
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    lbs, ubs = t.lbs, t.ubs
    if t.dim == 1:
        xs = np.linspace(lbs[0], ubs[0], num_points)
        ys = np.asarray(t.batch(xs[:, None]))
        ax.plot(xs, ys)
        ax.set_xlabel("x")
        ax.set_ylabel("f(x)")
    elif t.dim == 2:
        xs = np.linspace(lbs[0], ubs[0], num_points)
        ys = np.linspace(lbs[1], ubs[1], num_points)
        XX, YY = np.meshgrid(xs, ys)
        pts = np.stack([XX.ravel(), YY.ravel()], axis=1)
        ZZ = np.asarray(t.batch(pts)).reshape(XX.shape)
        cs = ax.contourf(XX, YY, ZZ, levels=levels)
        ax.figure.colorbar(cs, ax=ax)
        ax.set_xlabel("x1")
        ax.set_ylabel("x2")
    else:
        raise ValueError("Can only plot 1- or 2-dimensional TestFunctions")
    return ax


def _collapse_bounds(t1: TestFunction, t2: TestFunction) -> np.ndarray:
    """Per-dim bound closest to the origin (testfns.jl:26-39)."""
    lo = np.stack([t1.bounds[:, 0], t2.bounds[:, 0]], 1)
    hi = np.stack([t1.bounds[:, 1], t2.bounds[:, 1]], 1)
    pick = lambda a: a[np.arange(a.shape[0]), np.argmin(np.abs(a), axis=1)]
    return np.stack([pick(lo), pick(hi)], axis=1)


def _box(d, lo, hi):
    b = np.zeros((d, 2))
    b[:, 0], b[:, 1] = lo, hi
    return b


# --------------------------------------------------------------------------
# Families (reference line numbers in comments)
# --------------------------------------------------------------------------

def levy(d):  # testfns.jl:116
    def f(x):
        w = 1.0 + (x - 1.0) / 4.0
        t1 = jnp.sin(jnp.pi * w[0]) ** 2
        ts = jnp.sum((w[:-1] - 1.0) ** 2 * (1.0 + 10.0 * jnp.sin(jnp.pi * w[:-1] + 1.0) ** 2))
        t3 = (w[-1] - 1.0) ** 2 * (1.0 + jnp.sin(2.0 * jnp.pi * w[-1]) ** 2)
        return t1 + ts + t3
    return TestFunction(d, _box(d, -10.0, 10.0), (np.ones(d),), f)


def braninhoo(a=1.0, b=5.1 / (4 * np.pi**2), c=5 / np.pi, r=6.0, s=10.0, t=1 / (8 * np.pi)):  # :136
    def f(xy):
        x, y = xy[0], xy[1]
        return a * (y - b * x**2 + c * x - r) ** 2 + s * (1 - t) * jnp.cos(x) + s
    return TestFunction(2, np.array([[-5.0, 10.0], [0.0, 15.0]]),
                        (np.array([-np.pi, 12.275]), np.array([np.pi, 2.275]),
                         np.array([9.42478, 2.475])), f)


def rosenbrock():  # :155
    f = lambda x: (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2
    return TestFunction(2, np.array([[-2.0, 2.0], [-1.0, 3.0]]), (np.ones(2),), f)


def rastrigin(d):  # :162
    f = lambda x: 10.0 * d + jnp.sum(x**2 - 10.0 * jnp.cos(2 * jnp.pi * x))
    return TestFunction(d, _box(d, -5.12, 5.12), (np.zeros(d),), f)


def ackley(d, a=20.0, b=0.2, c=2 * np.pi):  # :173
    def f(x):
        nx = jnp.sqrt(jnp.sum(x * x) + 1e-300)
        cx = jnp.sum(jnp.cos(c * x))
        return -a * jnp.exp(-b / np.sqrt(d) * nx) - jnp.exp(cx / d) + a + np.e
    return TestFunction(d, _box(d, -32.768, 32.768), (np.zeros(d),), f)


def sixhump():  # :202
    def f(xy):
        x, y = xy[0], xy[1]
        return (4.0 - 2.1 * x**2 + x**4 / 3) * x**2 + x * y + (-4.0 + 4.0 * y**2) * y**2
    return TestFunction(2, np.array([[-3.0, 3.0], [-2.0, 2.0]]),
                        (np.array([0.089842, -0.712656]), np.array([-0.089842, 0.712656])), f)


def gramacylee():  # :227
    f = lambda x: jnp.sin(10 * jnp.pi * x[0]) / (2 * x[0]) + (x[0] - 1.0) ** 4
    return TestFunction(1, np.array([[0.5, 2.5]]), (np.array([0.548563]),), f)


def goldsteinprice():  # :238
    def f(xy):
        x1, x2 = xy[0], xy[1]
        t1 = 1 + (x1 + x2 + 1) ** 2 * (19 - 14 * x1 + 3 * x1**2 - 14 * x2 + 6 * x1 * x2 + 3 * x2**2)
        t2 = 30 + (2 * x1 - 3 * x2) ** 2 * (18 - 32 * x1 + 12 * x1**2 + 48 * x2 - 36 * x1 * x2 + 27 * x2**2)
        return t1 * t2
    return TestFunction(2, _box(2, -2.0, 2.0), (np.array([0.0, -1.0]),), f)


def beale():  # :280
    def f(xy):
        x1, x2 = xy[0], xy[1]
        return ((1.5 - x1 + x1 * x2) ** 2 + (2.25 - x1 + x1 * x2**2) ** 2
                + (2.625 - x1 + x1 * x2**3) ** 2)
    return TestFunction(2, _box(2, -4.5, 4.5), (np.array([3.0, 0.5]),), f)


def easom():  # :313
    def f(x):
        return -jnp.cos(x[0]) * jnp.cos(x[1]) * jnp.exp(-((x[0] - jnp.pi) ** 2 + (x[1] - jnp.pi) ** 2))
    return TestFunction(2, _box(2, -100.0, 100.0), (np.array([np.pi, np.pi]),), f)


def styblinskitang(d):  # :342
    f = lambda x: 0.5 * jnp.sum(x**4 - 16.0 * x**2 + 5.0 * x)
    return TestFunction(d, _box(d, -5.0, 5.0), (np.full(d, -2.903534),), f)


def bukinn6():  # :353
    def f(x):
        return 100.0 * jnp.sqrt(jnp.abs(x[1] - 0.01 * x[0] ** 2) + 1e-300) + 0.01 * jnp.abs(x[0] + 10.0)
    b = np.array([[-15.0, 3.0], [-15.0, 3.0]])
    return TestFunction(2, b, (np.array([-10.0, 1.0]),), f)


def crossintray():  # :383
    def f(x):
        t = jnp.abs(jnp.sin(x[0]) * jnp.sin(x[1])
                    * jnp.exp(jnp.abs(100.0 - jnp.sqrt(x[0] ** 2 + x[1] ** 2 + 1e-300) / jnp.pi))) + 1.0
        return -0.0001 * t**0.1
    return TestFunction(2, _box(2, -10.0, 10.0), (np.full(2, 1.34941),), f)


def eggholder():  # :394
    def f(x):
        return (-(x[1] + 47.0) * jnp.sin(jnp.sqrt(jnp.abs(x[1] + x[0] / 2 + 47.0) + 1e-300))
                - x[0] * jnp.sin(jnp.sqrt(jnp.abs(x[0] - (x[1] + 47.0)) + 1e-300)))
    return TestFunction(2, _box(2, -512.0, 512.0), (np.array([512.0, 404.2319]),), f)


def holdertable():  # :405
    def f(x):
        return -jnp.abs(jnp.sin(x[0]) * jnp.cos(x[1])
                        * jnp.exp(jnp.abs(1.0 - jnp.sqrt(x[0] ** 2 + x[1] ** 2 + 1e-300) / jnp.pi)))
    return TestFunction(2, _box(2, -10.0, 10.0), (np.array([8.05502, 9.66459]),), f)


def schwefel(d):  # :416
    f = lambda x: 418.9829 * d - jnp.sum(x * jnp.sin(jnp.sqrt(jnp.abs(x) + 1e-300)))
    return TestFunction(d, _box(d, -500.0, 500.0), (np.full(d, 420.9687),), f)


def levyn13():  # :427
    def f(x):
        return (jnp.sin(3 * jnp.pi * x[0]) ** 2
                + (x[0] - 1) ** 2 * (1 + jnp.sin(3 * jnp.pi * x[1]) ** 2)
                + (x[1] - 1) ** 2 * (1 + jnp.sin(2 * jnp.pi * x[1]) ** 2))
    return TestFunction(2, _box(2, -10.0, 10.0), (np.ones(2),), f)


def trid(d):  # :438
    f = lambda x: jnp.sum((x - 1.0) ** 2) - jnp.sum(x[1:] * x[:-1])
    xo = np.array([(i + 1) * (d - i) for i in range(d)], dtype=float)
    return TestFunction(d, _box(d, -float(d**2), float(d**2)), (xo,), f)


def mccormick():  # :449
    def f(x):
        return jnp.sin(x[0] + x[1]) + (x[0] - x[1]) ** 2 - 1.5 * x[0] + 2.5 * x[1] + 1.0
    return TestFunction(2, _box(2, -1.5, 4.0), (np.array([-0.54719, -1.54719]),), f)


_H3_A = np.array([[3.0, 10, 30], [0.1, 10, 35], [3.0, 10, 30], [0.1, 10, 35]])
_H3_P = 1e-4 * np.array([[3689, 1170, 2673], [4699, 4387, 7470], [1091, 8732, 5547], [381, 5743, 8828]])
_H6_A = np.array([[10, 3, 17, 3.5, 1.7, 8], [0.05, 10, 17, 0.1, 8, 14],
                  [3, 3.5, 1.7, 10, 17, 8], [17, 8, 0.05, 10, 0.1, 14]])
_H6_P = 1e-4 * np.array([[1312, 1696, 5569, 124, 8283, 5886], [2329, 4135, 8307, 3736, 1004, 9991],
                         [2348, 1451, 3522, 2883, 3047, 6650], [4047, 8828, 8732, 5743, 1091, 381]])
_H_ALPHA = np.array([1.0, 1.2, 3.0, 3.2])


def _hartmann(A, P, d, xopt):
    A_, P_ = jnp.asarray(A), jnp.asarray(P)
    al = jnp.asarray(_H_ALPHA)
    def f(x):
        t = jnp.sum(A_ * (x[None, :] - P_) ** 2, axis=1)
        return -jnp.sum(al * jnp.exp(-t))
    return TestFunction(d, _box(d, 0.0, 1.0), (np.asarray(xopt),), f)


def hartmann3d():  # :460
    return _hartmann(_H3_A, _H3_P, 3, [0.114614, 0.555649, 0.852547])


def hartmann4d():  # :496 (reference's "4D" actually evaluates the 6-D form)
    return _hartmann(_H6_A, _H6_P, 6, [0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573])


def hartmann6d():  # :532
    return _hartmann(_H6_A, _H6_P, 6, [0.20169, 0.150011, 0.476874, 0.275332, 0.311652, 0.6573])


def constant(n=0.0, *, lbs: Sequence[float], ubs: Sequence[float]):  # :568
    d = len(lbs)
    return TestFunction(d, np.stack([np.asarray(lbs, float), np.asarray(ubs, float)], 1),
                        (np.zeros(d),), lambda x: jnp.asarray(n, dtype=x.dtype) + 0.0 * x[0])


def quadratic1d(a=1.0, b=0.0, c=0.0, lb=-1.0, ub=1.0):  # :577
    return TestFunction(1, np.array([[lb, ub]]), (np.zeros(1),),
                        lambda x: a * x[0] ** 2 + b * x[0] + c)


def linearcosine1d(a=1.0, b=1.0, lb=-1.0, ub=1.0):  # :588
    return TestFunction(1, np.array([[lb, ub]]), (np.zeros(1),),
                        lambda x: a * x[0] * jnp.cos(b * x[0]))


_SHEKEL_C = np.array([[4.0, 1, 8, 6, 3, 2, 5, 8, 6, 7], [4.0, 1, 8, 6, 7, 9, 3, 1, 2, 3],
                      [4.0, 1, 8, 6, 3, 2, 5, 8, 6, 7], [4.0, 1, 8, 6, 7, 9, 3, 1, 2, 3]])
_SHEKEL_B = np.array([0.1, 0.2, 0.2, 0.4, 0.4, 0.6, 0.3, 0.7, 0.5, 0.5])


def shekel():  # :598
    C, B = jnp.asarray(_SHEKEL_C), jnp.asarray(_SHEKEL_B)
    def f(x):
        t = jnp.sum((x[:, None] - C) ** 2, axis=0)
        return -jnp.sum(1.0 / (t + B))
    return TestFunction(4, _box(4, 0.0, 10.0), (np.full(4, 4.0),), f)


def dropwave():  # :638
    def f(x):
        s = jnp.sum(x * x)
        return -(1.0 + jnp.cos(12.0 * jnp.sqrt(s + 1e-300))) / (0.5 * s + 2.0)
    return TestFunction(2, _box(2, -5.12, 5.12), (np.zeros(2),), f)


def griewank(d):  # :695 (last definition wins in the reference)
    idx = jnp.sqrt(jnp.arange(1, d + 1, dtype=float))
    f = lambda x: 1.0 + jnp.sum(x * x) / 4000.0 - jnp.prod(jnp.cos(x / idx))
    return TestFunction(d, _box(d, -600.0, 600.0), (np.zeros(d),), f)


def bohachevsky():  # :677
    def f(x):
        return (x[0] ** 2 + 2 * x[1] ** 2 - 0.3 * jnp.cos(3 * jnp.pi * x[0])
                - 0.4 * jnp.cos(4 * jnp.pi * x[1]) + 0.7)
    return TestFunction(2, _box(2, -100.0, 100.0), (np.zeros(2),), f)


# --------------------------------------------------------------------------
# Registry — names match the experiment drivers' --function-name payloads
# --------------------------------------------------------------------------

FUNCTION_REGISTRY: dict[str, Callable[[], TestFunction]] = {
    "gramacylee": gramacylee,
    "rastrigin1d": lambda: rastrigin(1),
    "rastrigin4d": lambda: rastrigin(4),
    "ackley1d": lambda: ackley(1),
    "ackley2d": lambda: ackley(2),
    "ackley3d": lambda: ackley(3),
    "ackley4d": lambda: ackley(4),
    "ackley5d": lambda: ackley(5),
    "ackley8d": lambda: ackley(8),
    "ackley10d": lambda: ackley(10),
    "ackley16d": lambda: ackley(16),
    "rosenbrock": rosenbrock,
    "sixhump": sixhump,
    "braninhoo": braninhoo,
    "hartmann3d": hartmann3d,
    "goldsteinprice": goldsteinprice,
    "beale": beale,
    "easom": easom,
    "styblinskitang1d": lambda: styblinskitang(1),
    "styblinskitang2d": lambda: styblinskitang(2),
    "styblinskitang3d": lambda: styblinskitang(3),
    "styblinskitang4d": lambda: styblinskitang(4),
    "styblinskitang10d": lambda: styblinskitang(10),
    "bukinn6": bukinn6,
    "crossintray": crossintray,
    "eggholder": eggholder,
    "holdertable": holdertable,
    "schwefel1d": lambda: schwefel(1),
    "schwefel2d": lambda: schwefel(2),
    "schwefel3d": lambda: schwefel(3),
    "schwefel4d": lambda: schwefel(4),
    "schwefel10d": lambda: schwefel(10),
    "levyn13": levyn13,
    "trid1d": lambda: trid(1),
    "trid2d": lambda: trid(2),
    "trid3d": lambda: trid(3),
    "trid4d": lambda: trid(4),
    "trid10d": lambda: trid(10),
    "mccormick": mccormick,
    "hartmann6d": hartmann6d,
    "hartmann4d": hartmann4d,
    "rastrigin2d": lambda: rastrigin(2),
    "levy2d": lambda: levy(2),
    "levy3d": lambda: levy(3),
    "levy5d": lambda: levy(5),
    "levy10d": lambda: levy(10),
    "griewank1d": lambda: griewank(1),
    "griewank2d": lambda: griewank(2),
    "griewank3d": lambda: griewank(3),
    "shekel": shekel,
    "shekel4d": shekel,  # reference payload name (adaptive_bayesopt.jl:375)
    "dropwave": dropwave,
    "bohachevsky": bohachevsky,
}


def get_function(name: str) -> TestFunction:
    """Look up a test function by experiment name (e.g. 'ackley5d')."""
    try:
        return FUNCTION_REGISTRY[name]()
    except KeyError:
        raise KeyError(
            f"Unknown test function {name!r}; known: {sorted(FUNCTION_REGISTRY)}"
        ) from None
