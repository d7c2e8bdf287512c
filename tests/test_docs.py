"""Docs-as-spec tests (the reference runs every docstring example as a
doctest, test/6_test_doctest.jl — here: every ``python`` block in docs/ and
README must at least compile, every ``mpc.<name>`` the docs mention must
exist, and every examples/ script must run to completion)."""
import pathlib
import re
import subprocess
import sys

import pytest

import mpc_tpu as mpc

ROOT = pathlib.Path(__file__).resolve().parents[1]
DOCS = sorted((ROOT / "docs").glob("*.md")) + [ROOT / "README.md"]
EXAMPLES = sorted((ROOT / "examples").glob("*.py"))


def _blocks(path):
    text = path.read_text()
    return re.findall(r"^```python\n(.*?)^```", text, re.S | re.M)


@pytest.mark.parametrize("path", DOCS, ids=lambda p: p.name)
def test_doc_code_blocks_compile(path):
    for i, src in enumerate(_blocks(path)):
        compile(src, f"{path.name}[block {i}]", "exec")


@pytest.mark.parametrize("path", DOCS, ids=lambda p: p.name)
def test_doc_mpc_names_exist(path):
    """Every `mpc.Name` / `mpc_tpu.Name` the docs reference is real API."""
    text = path.read_text()
    # (?<!["']) skips filename strings like "mpc.c"
    names = set(re.findall(r"(?<![\"'])\bmpc(?:_tpu)?\.([A-Za-z_][A-Za-z0-9_]*)",
                           text))
    missing = {n for n in names
               if not hasattr(mpc, n) and n not in ("parallel", "utils",
                                                    "models", "ops", "codegen",
                                                    "estimators", "controllers",
                                                    "native", "sim")}
    assert not missing, f"{path.name} references unknown API: {sorted(missing)}"


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_runs(path):
    r = subprocess.run([sys.executable, str(path)], capture_output=True,
                       text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.parametrize("path", DOCS, ids=lambda p: p.name)
def test_doc_code_blocks_execute(path, tmp_path, monkeypatch):
    """Docs-as-spec, executed (the reference runs every docstring example,
    test/6_test_doctest.jl): all python blocks of a doc run top-to-bottom in
    one shared namespace, like the reference's sequential manual examples."""
    import matplotlib
    matplotlib.use("Agg")
    monkeypatch.chdir(tmp_path)   # docs write artifacts (plots, mpc.c)
    blocks = _blocks(path)
    if not blocks:
        pytest.skip("no python blocks")
    ns = {"__name__": f"docs_{path.stem}"}
    for i, src in enumerate(blocks):
        code = compile(src, f"{path.name}[block {i}]", "exec")
        exec(code, ns)
