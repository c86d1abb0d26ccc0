"""Guard the shipped examples against package-API drift.

The round-3 diagnostics rewrite silently broke examples/quickstart.py's
import for a while (it referenced a deleted function); the examples are
documentation that must execute.  Full runs take ~1 min each on CPU, so
CI only checks that every name an example imports (and every attribute it
reads off an imported module at call sites we can resolve statically)
still exists — the cheap class of breakage that actually happened.
"""
import ast
import importlib
import pathlib

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).resolve().parent.parent / "examples")
    .glob("*.py"))


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_imports_resolve(path):
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module \
                and node.module.startswith("mcmctoffitting_tpu"):
            mod = importlib.import_module(node.module)
            for alias in node.names:
                assert hasattr(mod, alias.name), (
                    f"{path.name} imports {alias.name} from {node.module}, "
                    "which no longer exists")
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("mcmctoffitting_tpu"):
                    importlib.import_module(alias.name)


def test_console_script_targets_resolve():
    """Every pyproject [project.scripts] target imports and is callable."""
    tomllib = pytest.importorskip("tomllib")  # stdlib from 3.11

    repo = pathlib.Path(__file__).resolve().parent.parent
    with open(repo / "pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), (name, target)
