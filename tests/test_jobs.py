"""Lock/done/error protocol (reference main.py:60-125) incl. concurrent
acquisition from two processes."""

import json
import multiprocessing
import os
import time

# fork() under the multithreaded JAX runtime is the classic rare-CI-hang
# source (CPython RuntimeWarning in multiprocessing/popen_fork.py); these
# workers are self-contained top-level functions, so spawn is safe and race
# semantics are unchanged.
mp = multiprocessing.get_context("spawn")

import pytest

from path_gene_multimodal_tpu.core.jobs import (
    SlideJob,
    already_done,
    mark_step_done,
    release_lock,
    step_is_done,
    try_acquire_lock,
    write_done_flag,
    write_error_file,
)


def _job(tmp_path):
    return SlideJob(wsi_path=tmp_path / "slide1.svs", out_dir=tmp_path / "out")


def test_lock_acquire_release(tmp_path):
    job = _job(tmp_path)
    assert try_acquire_lock(job)
    assert job.lock_path.exists()
    payload = json.loads(job.lock_path.read_text())
    assert payload["pid"] == os.getpid()
    assert not try_acquire_lock(job)  # second acquire fails
    release_lock(job)
    assert try_acquire_lock(job)
    release_lock(job)


def test_stale_lock_reaped(tmp_path):
    job = _job(tmp_path)
    assert try_acquire_lock(job)
    old = time.time() - 50 * 3600
    os.utime(job.lock_path, (old, old))
    job2 = _job(tmp_path)
    assert try_acquire_lock(job2)  # stale (48 h default) → reaped
    release_lock(job2)


def _worker(args):
    tmp, idx = args
    from pathlib import Path

    job = SlideJob(wsi_path=Path(tmp) / "slide1.svs", out_dir=Path(tmp) / "out")
    return try_acquire_lock(job)


def test_concurrent_exclusive(tmp_path):
    with mp.Pool(4) as pool:
        results = pool.map(_worker, [(str(tmp_path), i) for i in range(4)])
    assert sum(results) == 1  # exactly one winner


def test_concurrent_stale_reap_exclusive(tmp_path):
    """Several workers racing to reap the SAME stale lock: the rename-then-
    unlink reap guarantees at most one acquires (a bare unlink could delete a
    competitor's fresh lock, letting two workers in)."""
    job = _job(tmp_path)
    assert try_acquire_lock(job)
    old = time.time() - 50 * 3600
    os.utime(job.lock_path, (old, old))
    with mp.Pool(4) as pool:
        results = pool.map(_worker, [(str(tmp_path), i) for i in range(4)])
    assert sum(results) == 1  # exactly one winner after the reap race


def test_reap_restores_stolen_fresh_lock(tmp_path, monkeypatch):
    """Interleaving where a competitor reaps the stale lock and re-creates a
    FRESH one between our stat and our rename: the rename captures the fresh
    lock (rename is by path), the inode check must detect it, restore it, and
    report the job as held."""
    job = _job(tmp_path)
    assert try_acquire_lock(job)
    old = time.time() - 50 * 3600
    os.utime(job.lock_path, (old, old))

    real_rename = os.rename

    def rename_after_competitor(src, dst):
        # competitor A reaps the stale lock and acquires a fresh one just
        # before our rename lands
        os.unlink(job.lock_path)
        job.lock_path.write_text('{"pid": 424242}')
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", rename_after_competitor)
    job2 = _job(tmp_path)
    assert not try_acquire_lock(job2)  # must NOT steal A's fresh lock
    monkeypatch.undo()
    assert job.lock_path.exists()
    assert json.loads(job.lock_path.read_text())["pid"] == 424242  # A's lock intact
    assert not list(tmp_path.glob("out/*.reap.*"))  # no tombstone litter


def test_done_flag_and_fallback(tmp_path):
    job = _job(tmp_path)
    job.out_dir.mkdir(parents=True)
    assert not already_done(job)
    write_done_flag(job, {"num_tiles": 10})
    assert already_done(job)
    payload = json.loads(job.done_path.read_text())
    assert payload["status"] == "done" and payload["num_tiles"] == 10
    # heuristic fallback (main.py:110-114)
    job2 = SlideJob(wsi_path=tmp_path / "slide2.svs", out_dir=job.out_dir)
    assert not already_done(job2, fallback_globs=("slide2*.geojson",))
    (job.out_dir / "slide2.geojson").write_text("{}")
    assert already_done(job2, fallback_globs=("slide2*.geojson",))


def test_error_file(tmp_path):
    job = _job(tmp_path)
    try:
        raise ValueError("boom")
    except ValueError as e:
        p = write_error_file(job, e)
    text = p.read_text()
    assert "boom" in text and "ValueError" in text


def test_step_manifest(tmp_path):
    job = _job(tmp_path)
    job.out_dir.mkdir(parents=True)
    art = job.out_dir / "x.h5"
    art.write_text("data")
    assert not step_is_done(job, "tessellate", "abc")
    mark_step_done(job, "tessellate", "abc", [art])
    assert step_is_done(job, "tessellate", "abc")
    assert not step_is_done(job, "tessellate", "other-hash")
    art.unlink()
    assert not step_is_done(job, "tessellate", "abc")  # artifact vanished
