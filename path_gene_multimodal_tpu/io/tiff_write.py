"""Minimal tiled-TIFF pyramid writer (classic little-endian TIFF).

Used to materialize synthetic slides as real ``.svs``-style tiled files so
the ``TiffTileSlide`` reader (and the native C++ decoder) are exercised
end-to-end in tests — the reference has no fixtures at all (SURVEY.md §4).

Supports compression: 8 (deflate via zlib), 7 (JPEG via cv2.imencode) and
33003/33005 (Aperio JPEG2000: lossless raw J2K codestreams via cv2 —
the tile payload convention of TCGA SVS slides, where each tile is a bare
``FF4F FF51`` codestream rather than a JP2 container).
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

_T_SHORT, _T_LONG, _T_RATIONAL, _T_ASCII = 3, 4, 5, 2


def _entry(tag: int, typ: int, count: int, value: int) -> bytes:
    return struct.pack("<HHII", tag, typ, count, value)


def write_tiled_tiff(
    path: str | Path,
    levels: list[np.ndarray],
    tile_size: int = 256,
    compression: int = 8,
    jpeg_quality: int = 90,
    description: str = "",
) -> Path:
    """Write an RGB pyramid as a multi-page tiled TIFF."""
    path = Path(path)
    pages = []
    blob = bytearray(b"II*\x00\x00\x00\x00\x00")  # header; IFD0 offset patched later

    def _align() -> None:
        while len(blob) % 2:
            blob.append(0)

    for img in levels:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape[:2]
        ta = (w + tile_size - 1) // tile_size
        td = (h + tile_size - 1) // tile_size
        offsets, counts = [], []
        for ty in range(td):
            for tx in range(ta):
                tile = np.full((tile_size, tile_size, 3), 255, np.uint8)
                ys, xs = ty * tile_size, tx * tile_size
                sub = img[ys : ys + tile_size, xs : xs + tile_size]
                tile[: sub.shape[0], : sub.shape[1]] = sub
                if compression == 8:
                    data = zlib.compress(tile.tobytes(), 6)
                elif compression == 7:
                    import cv2

                    ok, enc = cv2.imencode(
                        ".jpg", tile[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality]
                    )
                    if not ok:
                        raise ValueError("jpeg encode failed")
                    data = enc.tobytes()
                elif compression in (33003, 33005):
                    import cv2

                    ok, enc = cv2.imencode(
                        ".jp2", tile[:, :, ::-1],
                        [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, 1000],  # lossless
                    )
                    if not ok:
                        raise ValueError("jpeg2000 encode failed")
                    b = enc.tobytes()
                    # Aperio stores bare J2K codestreams, not JP2 containers —
                    # strip to the SOC marker
                    soc = b.find(b"\xff\x4f\xff\x51")
                    if soc < 0:
                        raise ValueError("no J2K codestream in jp2 output")
                    data = b[soc:]
                elif compression == 1:
                    data = tile.tobytes()
                else:
                    # writing raw bytes while tag 259 advertises another
                    # codec would produce a corrupt TIFF — fail loudly
                    raise ValueError(
                        f"unsupported write compression {compression} "
                        "(supported: 1 raw, 7 JPEG, 8 deflate, 33003/33005 J2K)"
                    )
                _align()
                offsets.append(len(blob))
                counts.append(len(data))
                blob.extend(data)
        pages.append((w, h, offsets, counts))

    desc_bytes = description.encode("latin-1") + b"\x00"
    ifd_offsets = []
    prev_next_ptr = 4  # header's IFD0 pointer
    for page_i, (w, h, offsets, counts) in enumerate(pages):
        # out-of-line arrays
        _align()
        off_arr_pos = len(blob)
        blob.extend(struct.pack(f"<{len(offsets)}I", *offsets))
        cnt_arr_pos = len(blob)
        blob.extend(struct.pack(f"<{len(counts)}I", *counts))
        bps_pos = len(blob)
        blob.extend(struct.pack("<3H", 8, 8, 8))
        desc_pos = len(blob)
        if page_i == 0 and description:
            blob.extend(desc_bytes)
        _align()
        ifd_pos = len(blob)
        ifd_offsets.append(ifd_pos)
        entries = [
            _entry(256, _T_LONG, 1, w),
            _entry(257, _T_LONG, 1, h),
            _entry(258, _T_SHORT, 3, bps_pos),
            _entry(259, _T_SHORT, 1, compression),
            _entry(262, _T_SHORT, 1, 6 if compression == 7 else 2),  # YCbCr for JPEG
            _entry(277, _T_SHORT, 1, 3),
            _entry(322, _T_LONG, 1, tile_size),
            _entry(323, _T_LONG, 1, tile_size),
            _entry(324, _T_LONG, len(offsets), off_arr_pos if len(offsets) > 1 else offsets[0]),
            _entry(325, _T_LONG, len(counts), cnt_arr_pos if len(counts) > 1 else counts[0]),
        ]
        if page_i == 0 and description:
            entries.insert(4, _entry(270, _T_ASCII, len(desc_bytes), desc_pos))
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        # patch previous IFD's next pointer → this IFD
        struct.pack_into("<I", blob, prev_next_ptr, ifd_pos)
        blob.extend(struct.pack("<H", len(entries)))
        for e in entries:
            blob.extend(e)
        next_ptr_pos = len(blob)
        blob.extend(struct.pack("<I", 0))
        prev_next_ptr = next_ptr_pos

    path.write_bytes(bytes(blob))
    return path


def write_striped_tiff(
    path: str | Path,
    levels: list[np.ndarray],
    rows_per_strip: int = 64,
    compression: int = 8,
    jpeg_quality: int = 90,
    description: str = "",
) -> Path:
    """Write an RGB pyramid as a multi-page STRIPED TIFF (tags 273/278/279
    instead of 322-325) — the layout of non-Aperio exports (libvips/
    CAMELYON-style pyramids, plain ``tifffile`` saves). The last strip of
    each page carries only the remaining rows (no padding), matching real
    writers. Compression: 8 (deflate) or 7 (JPEG)."""
    path = Path(path)
    pages = []
    blob = bytearray(b"II*\x00\x00\x00\x00\x00")

    def _align() -> None:
        while len(blob) % 2:
            blob.append(0)

    for img in levels:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        h, w = img.shape[:2]
        offsets, counts = [], []
        for ys in range(0, h, rows_per_strip):
            strip = img[ys : ys + rows_per_strip]
            if compression == 8:
                data = zlib.compress(strip.tobytes(), 6)
            elif compression == 7:
                import cv2

                ok, enc = cv2.imencode(
                    ".jpg", strip[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality]
                )
                if not ok:
                    raise ValueError("jpeg encode failed")
                data = enc.tobytes()
            elif compression == 1:
                data = strip.tobytes()
            else:
                raise ValueError(
                    f"unsupported write compression {compression} "
                    "(supported: 1 raw, 7 JPEG, 8 deflate)"
                )
            _align()
            offsets.append(len(blob))
            counts.append(len(data))
            blob.extend(data)
        pages.append((w, h, offsets, counts))

    desc_bytes = description.encode("latin-1") + b"\x00"
    prev_next_ptr = 4
    for page_i, (w, h, offsets, counts) in enumerate(pages):
        _align()
        off_arr_pos = len(blob)
        blob.extend(struct.pack(f"<{len(offsets)}I", *offsets))
        cnt_arr_pos = len(blob)
        blob.extend(struct.pack(f"<{len(counts)}I", *counts))
        bps_pos = len(blob)
        blob.extend(struct.pack("<3H", 8, 8, 8))
        desc_pos = len(blob)
        if page_i == 0 and description:
            blob.extend(desc_bytes)
        _align()
        ifd_pos = len(blob)
        entries = [
            _entry(256, _T_LONG, 1, w),
            _entry(257, _T_LONG, 1, h),
            _entry(258, _T_SHORT, 3, bps_pos),
            _entry(259, _T_SHORT, 1, compression),
            _entry(262, _T_SHORT, 1, 6 if compression == 7 else 2),
            _entry(273, _T_LONG, len(offsets), off_arr_pos if len(offsets) > 1 else offsets[0]),
            _entry(277, _T_SHORT, 1, 3),
            _entry(278, _T_LONG, 1, rows_per_strip),
            _entry(279, _T_LONG, len(counts), cnt_arr_pos if len(counts) > 1 else counts[0]),
        ]
        if page_i == 0 and description:
            entries.insert(4, _entry(270, _T_ASCII, len(desc_bytes), desc_pos))
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
        struct.pack_into("<I", blob, prev_next_ptr, ifd_pos)
        blob.extend(struct.pack("<H", len(entries)))
        for e in entries:
            blob.extend(e)
        next_ptr_pos = len(blob)
        blob.extend(struct.pack("<I", 0))
        prev_next_ptr = next_ptr_pos

    path.write_bytes(bytes(blob))
    return path
