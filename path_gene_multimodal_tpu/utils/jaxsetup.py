"""Process-level JAX setup: persistent compilation cache + platform helpers.

The axon-tunnel TPU environment compiles remotely (minutes per new program
shape), so the persistent compilation cache is the difference between a
4-minute and a 4-second tessellation step on every process start. Call
``setup_jax()`` once from every entry point (CLI, bench, workers) before
building models.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def _host_cpu_key() -> str:
    """Short identity hash of this host's CPU identity. XLA:CPU AOT
    executables bind to the compile host's microarchitecture — the loader
    only WARNS on mismatch ("could lead to execution errors such as
    SIGILL") and loads anyway — so cached CPU programs must never be
    reused after a container migrates hosts.

    The flags line alone is NOT enough: two VM hosts can expose identical
    (masked) flags while differing in microarch, so vendor/family/model/
    stepping pin the actual CPU.

    Known benign quirk (measured, NOT a migration): this XLA version's
    CPU AOT entries embed ``+prefer-no-scatter/+prefer-no-gather`` tuning
    pseudo-features in their compile-machine list, and the load-time host
    probe never reports them — so reloading a cache entry written by the
    SAME process config on the SAME host still logs the scary
    "could lead to execution errors such as SIGILL" error. Those flags
    are scheduling preferences, not ISA bits; the executables run fine.
    Ignore that specific warning."""
    import hashlib
    import platform as _plat

    ident = _plat.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            wanted = ("vendor_id", "cpu family", "model", "model name",
                      "stepping", "flags", "Features")
            seen: set[str] = set()
            for line in fh:
                key = line.split(":")[0].strip()
                if key in wanted and key not in seen:
                    seen.add(key)
                    ident += line
                if len(seen) == len(wanted):
                    break
    except OSError:
        ident += _plat.processor()
    return hashlib.sha256(ident.encode()).hexdigest()[:8]


def _cache_dir_for(platforms: str | None, base: Path) -> Path:
    """CPU-primary processes get a host-keyed subdir (see _host_cpu_key);
    TPU/axon-primary processes keep ``base`` itself so the expensive
    remote-compile cache survives host migrations (TPU executables don't
    bind to the host CPU)."""
    primary = (platforms or "").split(",")[0].strip().lower()
    if primary in ("", "cpu"):
        return base / f"cpu-{_host_cpu_key()}"
    return base


def setup_jax(cache_dir: str | Path | None = None, platform: str | None = None) -> None:
    """Enable the persistent compilation cache (idempotent). ``platform``
    forces a backend ("cpu" for semantic tools) — must run before any JAX
    backend initialization."""
    global _DONE
    import jax

    # Honor the user's JAX_PLATFORMS env var even when a sitecustomize
    # already overrode it at interpreter start (the axon image pins
    # jax_platforms="axon,cpu" that way, so `JAX_PLATFORMS=cpu python ...`
    # would otherwise still block on the TPU tunnel). With an explicit
    # jax_platforms list JAX initializes EVERY listed platform eagerly and
    # fails loudly — extra entries are NOT quiet fallbacks — so when the
    # env's primary platform differs from the config's, replace the config
    # with the env value EXACTLY. When the primaries already agree (ambient
    # env "axon" vs sitecustomize "axon,cpu"), the config is the
    # environment owner's deliberate choice: leave it untouched.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and not platform:
        current = getattr(jax.config, "jax_platforms", None) or ""
        if current.split(",")[0] != env_platforms.split(",")[0]:
            jax.config.update("jax_platforms", env_platforms)
    if platform:
        jax.config.update("jax_platforms", platform)
    if _DONE:
        return
    base = Path(
        cache_dir
        or os.environ.get("PGM_TPU_JAX_CACHE")
        or Path.home() / ".cache" / "pgm_tpu_jax"
    )
    cache = _cache_dir_for(getattr(jax.config, "jax_platforms", None), base)
    cache.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
    _DONE = True
