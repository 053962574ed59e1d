"""Samples-as-tests: every example runs and asserts its own result
(reference test strategy, SURVEY §4.3 — CMake registers each sample as a
ctest)."""

import importlib.util
import pathlib
import sys

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if path.stem == "nqueens_sat":
        mod.main(6)  # keep the suite fast
    elif path.stem == "jobshop_sat":
        mod.main(8.0)
    else:
        mod.main()
