"""ctypes bindings for the C++ tile decoder (native/tiledecode.cpp).

The decoder is a host-side throughput component: a pthread pool that decodes
batches of JPEG tile blobs (libjpeg) straight into one preallocated
(N, H, W, 3) uint8 buffer, so tessellation can sustain the ≥333 tiles/s
host-decode budget (SURVEY.md §7 hard part 5) without Python-loop overhead.

Build with ``python -m path_gene_multimodal_tpu.io.native`` or
``make -C native``. Falls back gracefully (callers catch ImportError /
RuntimeError) to the pure-Python cv2 path.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libtiledecode.so"


def _host_cpu_key() -> str:
    """Same microarch identity as utils.jaxsetup: the .so is compiled
    ``-march=native``, so one built on a previous host can SIGILL after a
    container migration even though the source mtime says it is fresh."""
    from path_gene_multimodal_tpu.utils.jaxsetup import _host_cpu_key as key

    return key()


def build_native(force: bool = False) -> Path:
    """Compile the decoder shared library with g++ (links libjpeg + zlib).
    Rebuilds when the source is newer OR the build host's CPU changed
    (``.buildhost`` sidecar records the microarch key).

    Safe under fleet-wide concurrency: host-change rebuilds fire in every
    worker at startup after a migration, so the compile goes to a temp
    path and is ``os.replace``d into place (a sibling's CDLL can never
    see a half-written .so), and an advisory flock dedupes the g++ runs
    when the filesystem supports it."""
    import fcntl
    import os
    import tempfile

    src = _NATIVE_DIR / "tiledecode.cpp"
    hostfile = _NATIVE_DIR / ".buildhost"
    key = _host_cpu_key()

    def _fresh() -> bool:
        return (
            _LIB_PATH.exists()
            and _LIB_PATH.stat().st_mtime >= src.stat().st_mtime
            and hostfile.exists()
            and hostfile.read_text().strip() == key
        )

    if _fresh() and not force:
        return _LIB_PATH
    with open(_NATIVE_DIR / ".buildlock", "w") as lf:
        try:
            fcntl.flock(lf, fcntl.LOCK_EX)
        except OSError:
            pass  # advisory only — temp+replace keeps losers correct
        if _fresh() and not force:  # a sibling built while we waited
            return _LIB_PATH
        fd, tmp = tempfile.mkstemp(dir=_NATIVE_DIR, suffix=".so.tmp")
        os.close(fd)
        try:
            cmd = [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", str(src), "-o", tmp,
                "-ljpeg", "-lz", "-lpthread",
            ]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, _LIB_PATH)
        finally:
            Path(tmp).unlink(missing_ok=True)
        hostfile.write_text(key + "\n")
    return _LIB_PATH


class NativeTileDecoder:
    """Threaded batch JPEG/deflate decoder."""

    def __init__(self, num_threads: int = 0):
        # build_native mtime-checks the source, so a prebuilt .so that
        # predates newer exported symbols is rebuilt here instead of
        # binding AttributeError below (which would silently disable the
        # whole native fast path via the callers' fallback)
        try:
            build_native()
        except Exception:
            if not _LIB_PATH.exists():
                raise
            # a prebuilt .so may still serve — but NOT one from a different
            # CPU: -march=native code from the old host would SIGILL (an
            # uncatchable process death, not an exception the callers'
            # cv2 fallback could absorb). Raising here routes callers to
            # the pure-Python path instead.
            hostfile = _NATIVE_DIR / ".buildhost"
            if hostfile.exists() and hostfile.read_text().strip() != _host_cpu_key():
                raise RuntimeError(
                    "native decoder rebuild failed and the existing "
                    "libtiledecode.so was built on a different CPU "
                    "(-march=native would SIGILL); using the Python fallback"
                )
        self._lib = ctypes.CDLL(str(_LIB_PATH))
        self._lib.decode_jpeg_batch.restype = ctypes.c_int
        self._lib.decode_jpeg_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),   # blobs
            ctypes.POINTER(ctypes.c_size_t),   # blob sizes
            ctypes.c_int,                       # n
            ctypes.c_char_p, ctypes.c_size_t,   # shared jpeg tables (or NULL)
            ctypes.c_int, ctypes.c_int,         # tile h, w
            ctypes.c_void_p,                    # out buffer (n*h*w*3)
            ctypes.c_int,                       # num threads
        ]
        self._lib.decode_deflate_batch.restype = ctypes.c_int
        self._lib.decode_deflate_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int,
        ]
        # the planar/nearest entry points are newer than the base decoder:
        # when the rebuild above failed and we are running a stale prebuilt
        # .so, bind them only if present so the OLD fast path keeps working
        # (an AttributeError here would make callers disable native entirely)
        self._has_opts = hasattr(self._lib, "decode_jpeg_batch_opts")
        if self._has_opts:
            self._lib.decode_jpeg_batch_opts.restype = ctypes.c_int
            self._lib.decode_jpeg_batch_opts.argtypes = (
                self._lib.decode_jpeg_batch.argtypes + [ctypes.c_int]
            )
        self._has_planar = hasattr(self._lib, "decode_jpeg_batch_planar")
        if self._has_planar:
            self._lib.decode_jpeg_batch_planar.restype = ctypes.c_int
            self._lib.decode_jpeg_batch_planar.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.c_int,
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p,                # out Y  (n, h, w)
                ctypes.c_void_p,                # out CbCr (n, ⌈h/2⌉, ⌈w/2⌉, 2)
                ctypes.c_void_p,                # per-tile ok flags (n,) u8
                ctypes.c_int,
            ]
        self._threads = num_threads

    def decode_jpeg_batch(
        self,
        blobs: list[bytes],
        tile_h: int,
        tile_w: int,
        jpeg_tables: bytes | None = None,
    ) -> np.ndarray | None:
        n = len(blobs)
        out = np.empty((n, tile_h, tile_w, 3), dtype=np.uint8)
        arr = (ctypes.c_char_p * n)(*blobs)
        sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        rc = self._lib.decode_jpeg_batch(
            arr, sizes, n,
            jpeg_tables if jpeg_tables else None,
            len(jpeg_tables) if jpeg_tables else 0,
            tile_h, tile_w,
            out.ctypes.data_as(ctypes.c_void_p),
            self._threads,
        )
        if rc != 0:
            return None
        return out

    def decode_jpeg_batch_nearest(
        self,
        blobs: list[bytes],
        tile_h: int,
        tile_w: int,
        jpeg_tables: bytes | None = None,
    ) -> np.ndarray | None:
        """RGB decode with nearest (non-fancy) chroma upsampling — libjpeg's
        merged-upsample path, the host oracle for the planar device feed."""
        if not self._has_opts:  # stale .so without the newer symbol
            return None
        n = len(blobs)
        out = np.empty((n, tile_h, tile_w, 3), dtype=np.uint8)
        arr = (ctypes.c_char_p * n)(*blobs)
        sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        rc = self._lib.decode_jpeg_batch_opts(
            arr, sizes, n,
            jpeg_tables if jpeg_tables else None,
            len(jpeg_tables) if jpeg_tables else 0,
            tile_h, tile_w,
            out.ctypes.data_as(ctypes.c_void_p),
            self._threads, 0,
        )
        return None if rc != 0 else out

    def decode_jpeg_batch_planar(
        self,
        blobs: list[bytes],
        tile_h: int,
        tile_w: int,
        jpeg_tables: bytes | None = None,
        return_ok: bool = False,
    ) -> tuple[np.ndarray, np.ndarray] | tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Decode 4:2:0 JPEG tiles to raw planes: (Y (n,h,w), CbCr
        (n,⌈h/2⌉,⌈w/2⌉,2)) uint8 — half the bytes of RGB. Default contract:
        None if any tile is not plain 4:2:0 YCbCr (caller falls back to the
        RGB path). With ``return_ok=True`` returns (Y, CbCr, ok (n,) bool)
        instead, keeping the successfully decoded tiles of a mixed batch so
        the caller can cache them and memoize the failures."""
        n = len(blobs)
        ch, cw = (tile_h + 1) // 2, (tile_w + 1) // 2
        if not self._has_planar:  # stale .so: report every tile as failed
            if return_ok:
                return (np.zeros((n, tile_h, tile_w), np.uint8),
                        np.zeros((n, ch, cw, 2), np.uint8),
                        np.zeros(n, dtype=bool))
            return None
        out_y = np.empty((n, tile_h, tile_w), dtype=np.uint8)
        out_cbcr = np.empty((n, ch, cw, 2), dtype=np.uint8)
        ok = np.zeros(n, dtype=np.uint8)
        arr = (ctypes.c_char_p * n)(*blobs)
        sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        rc = self._lib.decode_jpeg_batch_planar(
            arr, sizes, n,
            jpeg_tables if jpeg_tables else None,
            len(jpeg_tables) if jpeg_tables else 0,
            tile_h, tile_w,
            out_y.ctypes.data_as(ctypes.c_void_p),
            out_cbcr.ctypes.data_as(ctypes.c_void_p),
            ok.ctypes.data_as(ctypes.c_void_p),
            self._threads,
        )
        if return_ok:
            return out_y, out_cbcr, ok.astype(bool)
        return None if rc != 0 else (out_y, out_cbcr)

    def decode_deflate_batch(
        self, blobs: list[bytes], tile_h: int, tile_w: int
    ) -> np.ndarray | None:
        n = len(blobs)
        out = np.empty((n, tile_h, tile_w, 3), dtype=np.uint8)
        arr = (ctypes.c_char_p * n)(*blobs)
        sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        rc = self._lib.decode_deflate_batch(
            arr, sizes, n, tile_h, tile_w,
            out.ctypes.data_as(ctypes.c_void_p), self._threads,
        )
        if rc != 0:
            return None
        return out


if __name__ == "__main__":
    path = build_native(force="--force" in sys.argv)
    print(f"built {path}")
