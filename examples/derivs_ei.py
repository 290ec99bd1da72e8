"""Expected-improvement derivative chain, checked against finite differences.

Script analog of the reference's `/root/reference/notebooks/derivsEI.ipynb`
("Derivatives for expected improvement — sanity checks"): walk the full
derivative chain the inner Newton solve and the adjoint need —

  kernel profile psi(rho)            -> dpsi, d2psi
  kernel k(x,y)                      -> grad k, Hess k
  posterior mean mu = k_xX c         -> grad mu, Hess mu
  posterior std sigma                -> grad sigma, Hess sigma
  z = (f+ - mu - xi) / sigma         -> grad z   (minimization EI form)
  g(z) = z Phi(z) + phi(z)           -> g', g''
  alpha = sigma g(z)                 -> grad alpha, Hess alpha
  hyper/data perturbations           -> dmu, d(grad sigma), d(grad alpha)
                                        w.r.t. lengthscale and observations

— and print the relative error of each analytic quantity against a
centered finite difference, exactly the notebook's procedure. The
reference assembles every rule by hand (notebook cells 5-17); here the
same quantities come from the closed-form posterior
(models/surrogate.py::posterior) and jax.grad/jax.jvp, so this doubles
as an end-to-end autodiff-vs-FD audit.

Run:  python examples/derivs_ei.py [--seed 7] [--n 8] [--dim 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def centered_fd(f, x, h=1e-6):
    """Centered FD gradient of scalar f at vector (or scalar) x."""
    x = np.asarray(x, float)
    if x.ndim == 0:
        return (f(x + h) - f(x - h)) / (2 * h)
    g = np.zeros_like(x)
    for i in range(x.size):
        e = np.zeros_like(x)
        e[i] = h
        g[i] = (f(x + e) - f(x - e)) / (2 * h)
    return g


def relerr(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    den = max(float(np.max(np.abs(b))), 1e-12)
    return float(np.max(np.abs(a - b))) / den


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--n", type=int, default=8, help="observations")
    p.add_argument("--dim", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from rollout_bo_tpu.models import surrogate as sg
    from rollout_bo_tpu.models.decision_rules import EI
    from rollout_bo_tpu.ops import kernels as K

    rng = np.random.default_rng(args.seed)
    d, n = args.dim, args.n
    ell = 0.9
    kernel = K.squared_exponential((ell,))

    checks = []

    # -- kernel profile: psi, dpsi, d2psi (notebook cell 5) ----------------
    rho = 1.23
    psi = lambda r: float(kernel.psi(jnp.asarray(r)))  # noqa: E731
    dpsi = float(jax.grad(kernel.psi)(jnp.asarray(rho)))
    d2psi = float(jax.grad(jax.grad(kernel.psi))(jnp.asarray(rho)))
    checks.append(("dpsi/drho", relerr(dpsi, centered_fd(psi, rho))))
    checks.append(("d2psi/drho2",
                   relerr(d2psi, centered_fd(lambda r: float(
                       jax.grad(kernel.psi)(jnp.asarray(r))), rho))))

    # -- kernel point derivatives: grad k, Hess k (notebook cell 6) --------
    x = jnp.asarray(rng.uniform(-1, 1, d))
    y = jnp.asarray(rng.uniform(-1, 1, d))
    kf = lambda xv: float(K.kernel_value(kernel, jnp.asarray(xv) - y))  # noqa: E731
    gk = np.asarray(K.kernel_grad(kernel, x - y))
    Hk = np.asarray(K.kernel_hess(kernel, x - y))
    checks.append(("grad k", relerr(gk, centered_fd(kf, np.asarray(x)))))
    Hfd = np.stack([centered_fd(
        lambda xv: np.asarray(K.kernel_grad(kernel, jnp.asarray(xv) - y))[i],
        np.asarray(x)) for i in range(d)])
    checks.append(("Hess k", relerr(Hk, Hfd)))

    # -- GP fit -------------------------------------------------------------
    X = rng.uniform(-1, 1, (n, d))
    yobs = np.sin(X.sum(axis=1)) + 0.1 * rng.standard_normal(n)
    state = sg.fit(kernel, X, yobs, capacity=n, noise=1e-8)
    # query near (not at) the incumbent so z = (f+ - mu)/sigma is O(1) and
    # the EI chain is exercised away from its vanishing tail
    xq = jnp.asarray(X[int(np.argmin(yobs))] + 0.35)
    post = sg.posterior(state, xq)

    # -- mean chain: mu, grad mu, Hess mu (notebook cells 7-8) --------------
    muf = lambda xv: float(sg.posterior(state, jnp.asarray(xv)).mu)  # noqa: E731
    checks.append(("grad mu", relerr(np.asarray(post.grad_mu),
                                     centered_fd(muf, np.asarray(xq)))))
    Hmu_fd = np.stack([centered_fd(
        lambda xv: np.asarray(sg.posterior(state, jnp.asarray(xv)).grad_mu)[i],
        np.asarray(xq)) for i in range(d)])
    checks.append(("Hess mu", relerr(np.asarray(post.hess_mu), Hmu_fd)))

    # -- std chain: sigma, grad sigma, Hess sigma (notebook cells 10-11) ----
    sf = lambda xv: float(sg.posterior(state, jnp.asarray(xv)).sigma)  # noqa: E731
    checks.append(("grad sigma", relerr(np.asarray(post.grad_sigma),
                                        centered_fd(sf, np.asarray(xq)))))
    Hs_fd = np.stack([centered_fd(
        lambda xv: np.asarray(sg.posterior(state, jnp.asarray(xv)).grad_sigma)[i],
        np.asarray(xq)) for i in range(d)])
    checks.append(("Hess sigma", relerr(np.asarray(post.hess_sigma), Hs_fd)))

    # -- z and g chains (notebook cells 13-16; minimization EI form) --------
    fmini = float(sg.get_active_minimum(state))
    xi = 0.0
    zf = lambda xv: (fmini - float(sg.posterior(state, jnp.asarray(xv)).mu) - xi) \
        / float(sg.posterior(state, jnp.asarray(xv)).sigma)  # noqa: E731
    z_grad = (-np.asarray(post.grad_mu) - zf(np.asarray(xq))
              * np.asarray(post.grad_sigma)) / float(post.sigma)
    checks.append(("grad z", relerr(z_grad, centered_fd(zf, np.asarray(xq)))))

    from jax.scipy.stats import norm
    g = lambda z: float(z * norm.cdf(jnp.asarray(z)) + norm.pdf(jnp.asarray(z)))  # noqa: E731
    z0 = zf(np.asarray(xq))
    checks.append(("g'(z) = Phi(z)",
                   relerr(float(norm.cdf(jnp.asarray(z0))), centered_fd(g, z0))))
    checks.append(("g''(z) = phi(z)",
                   relerr(float(norm.pdf(jnp.asarray(z0))),
                          centered_fd(lambda z: float(norm.cdf(jnp.asarray(z))), z0))))

    # -- alpha = sigma g(z): value, grad, Hess (notebook cells 15-17) -------
    rule = EI()
    theta = jnp.zeros((1,), state.X.dtype)
    a, ga, Ha = sg.acquisition_value_grad_hess(state, rule, xq, theta)
    af = lambda xv: float(sg.acquisition(state, rule, jnp.asarray(xv), theta))  # noqa: E731
    checks.append(("EI value = sigma*g(z)",
                   relerr(float(a), float(post.sigma) * g(z0))))
    checks.append(("grad EI", relerr(np.asarray(ga), centered_fd(af, np.asarray(xq)))))
    Ha_fd = np.stack([centered_fd(
        lambda xv: np.asarray(sg.acquisition_grad(
            state, rule, jnp.asarray(xv), theta)[1])[i],
        np.asarray(xq)) for i in range(d)])
    checks.append(("Hess EI", relerr(np.asarray(Ha), Ha_fd)))

    # -- hyper/data perturbations (notebook cells 9, 11, 17) ----------------
    # dmu, d(grad sigma), d(grad alpha) under a lengthscale variation ldot
    # and an observation variation ydot: one jvp through refit replaces the
    # notebook's hand-assembled delta-chains.
    ldot, ydot = 0.37, rng.standard_normal(n)

    def with_hypers(ell_v, y_v):
        st = sg.fit(K.squared_exponential((float(ell_v),)), X, np.asarray(y_v),
                    capacity=n, noise=1e-8)
        pq = sg.posterior(st, xq)
        _, gA = sg.acquisition_grad(st, rule, xq, theta)
        return pq.mu, pq.grad_sigma, gA

    def jvp_with(ell_v, y_v):
        def inner(ev, yv):
            st = sg.fit(K.squared_exponential((ev,)), X, yv, capacity=n,
                        noise=1e-8)
            pq = sg.posterior(st, xq)
            _, gA = sg.acquisition_grad(st, rule, xq, theta)
            return pq.mu, pq.grad_sigma, gA

        return jax.jvp(inner, (jnp.asarray(ell_v), jnp.asarray(y_v)),
                       (jnp.asarray(ldot), jnp.asarray(ydot)))

    _, (dmu, dgs, dga) = jvp_with(ell, yobs)
    h = 1e-6
    hi = with_hypers(ell + h * ldot, yobs + h * ydot)
    lo = with_hypers(ell - h * ldot, yobs - h * ydot)
    fd3 = [(np.asarray(a) - np.asarray(b)) / (2 * h) for a, b in zip(hi, lo)]
    checks.append(("delta mu (hyper+data)", relerr(np.asarray(dmu), fd3[0])))
    checks.append(("delta grad sigma", relerr(np.asarray(dgs), fd3[1])))
    checks.append(("delta grad EI", relerr(np.asarray(dga), fd3[2])))

    print(f"== EI derivative chain vs centered finite differences "
          f"(d={d}, n={n}) ==")
    worst = 0.0
    for name, e in checks:
        print(f"  {name:<24} rel err {e:.3e}")
        worst = max(worst, e)
    print(f"worst relative error: {worst:.3e}")
    if worst > 1e-5:
        raise SystemExit("FD check failed (worst > 1e-5)")
    print("all checks passed")


if __name__ == "__main__":
    main()
