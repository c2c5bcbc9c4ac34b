"""Import hygiene: no module of the package may initialize a JAX backend at
import time.

The ambient production environment pins JAX_PLATFORMS=axon (one real TPU via
a tunnel); the documented recipe for CPU work is to switch platforms AFTER
importing jax (CLAUDE.md environment gotchas). A module-level device array
(e.g. ``jnp.asarray(...)`` constants) initializes the backend during import,
defeating that switch — and blocks for minutes when the tunnel is down.
"""

import subprocess
import sys
from pathlib import Path

_PROBE = r"""
import jax
import jax._src.xla_bridge as xb

def _boom(*a, **k):
    raise RuntimeError("JAX backend initialized at import time")

xb.backends = _boom
xb._suggest_missing_backends = lambda *a, **k: None

import importlib
import pkgutil
import traceback

import path_gene_multimodal_tpu

bad = []
for m in pkgutil.walk_packages(
    path_gene_multimodal_tpu.__path__, "path_gene_multimodal_tpu."
):
    try:
        importlib.import_module(m.name)
    except RuntimeError as e:
        if "backend initialized at import time" in str(e):
            bad.append(m.name)
        else:
            raise
    except ImportError:
        pass  # optional deps (torch-free deploys etc.)
if bad:
    print("BACKEND-AT-IMPORT:" + ",".join(bad))
    raise SystemExit(1)
print("CLEAN")
"""


def test_no_backend_init_at_import():
    env_script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n" + _PROBE
    )
    proc = subprocess.run(
        [sys.executable, "-c", env_script],
        capture_output=True, text=True, timeout=300,
        cwd=Path(__file__).resolve().parents[1],
    )
    assert proc.returncode == 0 and "CLEAN" in proc.stdout, (
        proc.stdout + proc.stderr
    )


_SETUP_JAX_PROBE = r"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

# simulate the axon sitecustomize, which overrides the env var at
# interpreter start (and in this test image genuinely does so again here)
jax.config.update("jax_platforms", "axon,cpu")

import path_gene_multimodal_tpu.utils.jaxsetup as js

js.setup_jax()
assert jax.config.jax_platforms == "cpu", jax.config.jax_platforms
assert jax.default_backend() == "cpu"

# same primary platform: the config is the environment owner's choice —
# untouched (explicit jax_platforms lists are initialized EAGERLY, so the
# override must be exact when it happens, not a prefix merge)
os.environ["JAX_PLATFORMS"] = "axon"
jax.config.update("jax_platforms", "axon,cpu")
js._DONE = False
js.setup_jax()
assert jax.config.jax_platforms == "axon,cpu", jax.config.jax_platforms
# different primary: replaced EXACTLY by the env value (no extra entries
# that would still eagerly initialize the unwanted backend)
os.environ["JAX_PLATFORMS"] = "cpu"
js._DONE = False
js.setup_jax()
assert jax.config.jax_platforms == "cpu", jax.config.jax_platforms

# the explicit platform argument still wins over the env var
js._DONE = False
js.setup_jax(platform="cpu")
assert jax.config.jax_platforms == "cpu"
print("SETUPJAX-OK")
"""


def test_cache_dir_host_keyed_for_cpu(tmp_path):
    """XLA:CPU AOT cache entries bind to the compile host's CPU features
    (the loader only warns on mismatch and may SIGILL) — CPU-primary
    processes must use a host-keyed subdir, while axon/TPU-primary keeps
    the shared base so the expensive remote-compile cache survives."""
    from path_gene_multimodal_tpu.utils.jaxsetup import (
        _cache_dir_for,
        _host_cpu_key,
    )

    key = _host_cpu_key()
    assert len(key) == 8 and key == _host_cpu_key()  # stable on one host
    assert _cache_dir_for("cpu", tmp_path) == tmp_path / f"cpu-{key}"
    assert _cache_dir_for("", tmp_path) == tmp_path / f"cpu-{key}"
    assert _cache_dir_for(None, tmp_path) == tmp_path / f"cpu-{key}"
    assert _cache_dir_for("axon,cpu", tmp_path) == tmp_path
    assert _cache_dir_for("tpu", tmp_path) == tmp_path


def test_setup_jax_reasserts_user_env_platforms():
    """`JAX_PLATFORMS=cpu python <entry point>` must actually select CPU even
    though the axon sitecustomize re-pins jax_platforms at interpreter start
    — otherwise every entry point blocks on the TPU tunnel (~18 min when it
    is down) despite the user explicitly asking for CPU."""
    proc = subprocess.run(
        [sys.executable, "-c", _SETUP_JAX_PROBE],
        capture_output=True, text=True, timeout=300,
        cwd=Path(__file__).resolve().parents[1],
    )
    assert proc.returncode == 0 and "SETUPJAX-OK" in proc.stdout, (
        proc.stdout + proc.stderr
    )
