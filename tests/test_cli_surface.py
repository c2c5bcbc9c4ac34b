"""Console-script surface smoke: every entry point in pyproject.toml must
import and parse ``--help`` without touching an accelerator (regression
guard for import-time breakage anywhere in a CLI's import graph — the
reference's equivalent failure mode was scripts that crashed at import,
SURVEY.md §7 "module-level execution")."""

import subprocess
import sys
import tomllib
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
SCRIPTS = tomllib.loads((ROOT / "pyproject.toml").read_text())["project"]["scripts"]


@pytest.mark.parametrize("name", sorted(SCRIPTS))
def test_cli_help(name):
    target = SCRIPTS[name]
    module = target.split(":")[0]
    proc = subprocess.run(
        [sys.executable, "-m", module, "--help"],
        capture_output=True, text=True, timeout=120,
        cwd=ROOT, env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
                       "HOME": "/root"},
    )
    assert proc.returncode == 0, f"{name}: {proc.stderr[-800:]}"
    assert "usage" in proc.stdout.lower(), name


def test_every_cli_module_has_script():
    """Every cli/*.py with a main() is registered as a console script —
    a new CLI that forgets the pyproject entry is invisible to users."""
    modules = {
        f"path_gene_multimodal_tpu.cli.{p.stem}"
        for p in (ROOT / "path_gene_multimodal_tpu" / "cli").glob("*.py")
        if p.stem != "__init__" and "def main(" in p.read_text()
    }
    registered = {t.split(":")[0] for t in SCRIPTS.values()}
    assert modules <= registered, modules - registered
