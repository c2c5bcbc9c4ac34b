"""Console-script surface smoke: every entry point in pyproject.toml must
import and parse ``--help`` without touching an accelerator (regression
guard for import-time breakage anywhere in a CLI's import graph — the
reference's equivalent failure mode was scripts that crashed at import,
SURVEY.md §7 "module-level execution")."""

import subprocess
import sys
from pathlib import Path

import pytest

try:  # tomllib is 3.11+; pyproject declares requires-python >=3.10
    import tomllib
except ModuleNotFoundError:  # pragma: no cover - py3.10 fallback
    import tomli as tomllib  # type: ignore[no-redef]

ROOT = Path(__file__).resolve().parents[1]
SCRIPTS = tomllib.loads((ROOT / "pyproject.toml").read_text())["project"]["scripts"]


@pytest.mark.parametrize("name", sorted(SCRIPTS))
def test_cli_help(name):
    target = SCRIPTS[name]
    module = target.split(":")[0]
    # launch through a shim that pins the CPU backend via jax.config BEFORE
    # the CLI runs: the axon sitecustomize re-pins "axon,cpu" at interpreter
    # start, so JAX_PLATFORMS=cpu alone cannot stop a regressed CLI from
    # camping on (or silently exercising) the real TPU tunnel (CLAUDE.md)
    shim = (
        "import sys, runpy\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"sys.argv = [{module!r}, '--help']\n"
        f"runpy.run_module({module!r}, run_name='__main__')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", shim],
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
