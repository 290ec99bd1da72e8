"""Smoke-pin every notebook-parity example script.

The examples/ scripts are the analogs of the reference's notebooks — its
de-facto integration tests (SURVEY §4). Each is importable with a
main(argv) entry; running them at tiny configs keeps them from
bit-rotting as the engine evolves. derivs_ei and explanatory hard-fail
internally on finite-difference mismatches, so these smokes also
re-assert the derivative-chain and adjoint validations.
"""

import importlib.util
import os
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name,argv", [
    ("derivs_ei", ["--n", "6", "--dim", "2"]),
    ("overview", ["--budget", "4", "--n-init", "3", "--grid", "3"]),
    ("rollout_bo", ["--budget", "3", "--mc", "6", "--horizon", "1"]),
    ("explanatory", ["--grid", "5", "--mc", "16", "--horizon", "1"]),
    ("fantasy_conditioning", ["--capacity", "12", "--n-init", "4",
                              "--horizon", "3", "--dim", "2"]),
])
def test_example_runs(name, argv):
    _load(name).main(argv)


def test_laplace_approximation_example():
    mod = _load("laplace_approximation")  # argv-free main()
    try:
        mod.main()
    except SystemExit as e:
        assert not e.code
