"""Slide readers: ArraySlide pyramid semantics, synthetic fixture, TIFF
round-trip through our own writer + parser, native decoder parity."""

import numpy as np
import pytest

from path_gene_multimodal_tpu.io.slide import ArraySlide, open_slide, synthetic_wsi
from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff


def test_array_slide_pyramid(small_slide):
    dims = small_slide.level_dimensions
    assert dims[0] == (2048, 1536)
    assert dims[1] == (1024, 768)
    ds = small_slide.level_downsamples
    assert ds[0] == 1.0 and ds[1] == 2.0


def test_read_region_level0(small_slide):
    region = small_slide.read_region((100, 200), 0, (64, 32))
    assert region.shape == (32, 64, 3)
    np.testing.assert_array_equal(region, small_slide._levels[0][200:232, 100:164])


def test_read_region_level1_uses_level0_coords(small_slide):
    region = small_slide.read_region((200, 400), 1, (50, 50))
    np.testing.assert_array_equal(region, small_slide._levels[1][200:250, 100:150])


def test_read_region_out_of_bounds_pads_white(small_slide):
    region = small_slide.read_region((2048 - 10, 0), 0, (20, 20))
    assert (region[:, 10:] == 255).all()


def test_thumbnail_aspect(small_slide):
    thumb = small_slide.get_thumbnail((512, 512))
    assert thumb.shape == (384, 512, 3)  # aspect preserved


def test_best_level():
    s = ArraySlide(np.zeros((512, 512, 3), np.uint8), num_levels=4)
    assert s.get_best_level_for_downsample(1.0) == 0
    assert s.get_best_level_for_downsample(2.0) == 1
    assert s.get_best_level_for_downsample(3.0) == 1
    assert s.get_best_level_for_downsample(100.0) == 3


def test_synthetic_deterministic():
    a = synthetic_wsi(512, 512, seed=3, n_blobs=2, nuclei_per_blob=20)
    b = synthetic_wsi(512, 512, seed=3, n_blobs=2, nuclei_per_blob=20)
    np.testing.assert_array_equal(a._levels[0], b._levels[0])


def test_npz_roundtrip(tmp_path, small_slide):
    p = tmp_path / "s.npz"
    small_slide.save(p)
    loaded = open_slide(p)
    np.testing.assert_array_equal(
        loaded.read_region((0, 0), 0, (100, 100)),
        small_slide.read_region((0, 0), 0, (100, 100)),
    )
    assert loaded.mpp == small_slide.mpp


@pytest.mark.parametrize("compression", [8, 7])
def test_tiff_roundtrip(tmp_path, compression):
    rng = np.random.default_rng(1)
    # smooth-ish image so JPEG stays close
    base = np.kron(
        rng.integers(60, 200, size=(16, 20, 3), dtype=np.uint8), np.ones((40, 40, 1), np.uint8)
    )
    levels = [base, base[::2, ::2]]
    p = write_tiled_tiff(
        tmp_path / "t.svs", levels, tile_size=256, compression=compression,
        description="Aperio fake |MPP = 0.2520|",
    )
    slide = TiffTileSlide(p)
    assert slide.level_dimensions[0] == (800, 640)
    assert slide.level_dimensions[1] == (400, 320)
    assert slide.mpp == pytest.approx(0.252)
    region = slide.read_region((128, 64), 0, (256, 256))
    golden = base[64:320, 128:384]
    if compression == 8:
        np.testing.assert_array_equal(region, golden)
    else:
        assert np.abs(region.astype(int) - golden.astype(int)).mean() < 6.0
    # cross-tile read at level 1
    r1 = slide.read_region((100, 100), 1, (200, 200))
    g1 = levels[1][50:250, 50:250]
    if compression == 8:
        np.testing.assert_array_equal(r1, g1)


@pytest.mark.parametrize("compression", [33003, 33005])
def test_tiff_jpeg2000_roundtrip(tmp_path, compression):
    """Aperio J2K slides (the common TCGA SVS case): tiles are bare J2K
    codestreams under compression tag 33003/33005 — written lossless here,
    so the read must be pixel-exact (ref consumer surface:
    tnbc_config.py:28 `.svs` in WSI_EXTS)."""
    rng = np.random.default_rng(5)
    base = np.kron(
        rng.integers(30, 225, size=(12, 10, 3), dtype=np.uint8),
        np.ones((64, 64, 1), np.uint8),
    )
    levels = [base, base[::2, ::2]]
    p = write_tiled_tiff(
        tmp_path / "j2k.svs", levels, tile_size=256, compression=compression,
        description="Aperio fake |MPP = 0.2520|",
    )
    slide = TiffTileSlide(p)
    assert slide.level_dimensions[0] == (640, 768)
    # cross-tile level-0 read: exact (lossless codestreams)
    region = slide.read_region((128, 192), 0, (384, 320))
    np.testing.assert_array_equal(region, base[192:512, 128:512])
    # level-1 read
    r1 = slide.read_region((100, 100), 1, (200, 200))
    np.testing.assert_array_equal(r1, levels[1][50:250, 50:250])
    # tile payloads really are raw codestreams (FF4F FF51 SOC marker)
    page = slide._pages[0]
    blob = slide._tile_bytes(page, 0)
    assert blob[:4] == b"\xff\x4f\xff\x51"


def test_open_slide_dispatch_tiff(tmp_path):
    img = np.full((300, 300, 3), 128, np.uint8)
    p = write_tiled_tiff(tmp_path / "x.tif", [img], tile_size=256, compression=8)
    slide = open_slide(p)
    assert slide.level_dimensions[0] == (300, 300)
    region = slide.read_region((0, 0), 0, (300, 300))
    np.testing.assert_array_equal(region, img)


def test_striped_tiff_deflate_roundtrip(tmp_path):
    """Striped (non-tiled) pyramids — libvips/CAMELYON-style exports, plain
    tifffile saves — read through the SAME reader instead of falling back
    to a whole-image cv2 decode (multi-GB on a real WSI). Height is not a
    multiple of RowsPerStrip, so the last strip decodes short."""
    from path_gene_multimodal_tpu.io.tiff_write import write_striped_tiff

    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (333, 420, 3), np.uint8)  # 333 % 64 != 0
    levels = [base, base[::2, ::2]]
    p = write_striped_tiff(tmp_path / "s.tif", levels, rows_per_strip=64,
                           compression=8, description="striped |MPP = 0.5|")
    slide = TiffTileSlide(p)
    assert slide.level_dimensions == [(420, 333), (210, 167)]
    assert slide._pages[0].is_strips
    assert slide.mpp == 0.5
    # full-slide exact read (deflate is lossless), incl. the short strip
    np.testing.assert_array_equal(
        slide.read_region((0, 0), 0, (420, 333)), base
    )
    # cross-strip interior read + level-1 read
    np.testing.assert_array_equal(
        slide.read_region((50, 60), 0, (100, 200)), base[60:260, 50:150]
    )
    np.testing.assert_array_equal(
        slide.read_region((40, 40), 1, (80, 90)), levels[1][20:110, 20:100]
    )
    # open_slide routes it through the TIFF reader (no cv2 fallback)
    s2 = open_slide(p)
    assert isinstance(s2, TiffTileSlide)
    s2.close()
    slide.close()


def test_striped_tiff_jpeg_roundtrip(tmp_path):
    from path_gene_multimodal_tpu.io.tiff_write import write_striped_tiff

    rng = np.random.default_rng(8)
    base = np.kron(
        rng.integers(40, 215, size=(10, 12, 3), dtype=np.uint8),
        np.ones((32, 32, 1), np.uint8),
    )  # 320x384, smooth blocks keep JPEG error small
    p = write_striped_tiff(tmp_path / "sj.tif", [base], rows_per_strip=48,
                           compression=7, jpeg_quality=95)
    slide = TiffTileSlide(p)
    got = slide.read_region((0, 0), 0, (384, 320))
    assert got.shape == base.shape
    err = np.abs(got.astype(int) - base.astype(int))
    # lossy: ringing spikes at color-block edges; a mis-stitched strip
    # would blow the mean far past this bound
    assert err.mean() < 3
    # block interiors are clean — sample the center of each 32-px block
    centers = err[16::32, 16::32]
    assert centers.max() <= 12
    slide.close()


def test_striped_pages_never_preempt_tiled_pyramid(tmp_path):
    """ONE file holding BOTH a tiled pyramid and striped pages (the SVS
    layout: base + levels tiled, thumbnail/label/macro striped): the
    striped pages must stay associated images, never levels — even when a
    striped page is an exact power-of-two downsample of the base (the
    thumbnail here is base/4, which would pass the pyramid-factor test)."""
    from path_gene_multimodal_tpu.io.tiff_write import write_tiff_pages, write_striped_tiff

    rng = np.random.default_rng(17)
    base = rng.integers(0, 255, (512, 768, 3), np.uint8)
    lvl1 = base[::2, ::2]
    thumb = base[::4, ::4]  # striped, exact 4× downsample — the trap
    label = np.full((96, 200, 3), 40, np.uint8)
    p = write_tiff_pages(
        tmp_path / "mixed.svs",
        [
            {"img": base, "layout": "tiled", "tile_size": 256,
             "description": "Aperio mixed |MPP = 0.25|"},
            {"img": thumb, "layout": "striped", "rows_per_strip": 32},
            {"img": lvl1, "layout": "tiled", "tile_size": 256},
            {"img": label, "layout": "striped", "rows_per_strip": 96,
             "description": "Aperio label 200x96"},
        ],
    )
    slide = TiffTileSlide(p)
    assert slide.level_dimensions == [(768, 512), (384, 256)]
    assert all(not pg.is_strips for pg in slide._pages)
    np.testing.assert_array_equal(
        slide.read_region((100, 100), 0, (200, 150)), base[100:250, 100:300]
    )
    # the excluded striped pages surface as associated images (openslide/
    # tiffslide surface): first anonymous page = thumbnail, described page
    # by its Aperio name
    assert slide.associated_image_names == ["thumbnail", "label"]
    np.testing.assert_array_equal(slide.read_associated_image("thumbnail"), thumb)
    np.testing.assert_array_equal(slide.associated_images["label"], label)
    slide.close()
    # and an all-striped file really does use strips as levels
    ps = write_striped_tiff(tmp_path / "s.tif", [base], rows_per_strip=100)
    ss = TiffTileSlide(ps)
    assert all(pg.is_strips for pg in ss._pages)
    assert not ss.supports_planar(0)  # planar fast path gated off
    ss.close()


def test_native_decoder_jpeg(tmp_path):
    import cv2

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder

    try:
        dec = NativeTileDecoder()
    except Exception:
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(2)
    tiles = [
        np.kron(rng.integers(0, 255, (8, 8, 3), np.uint8), np.ones((32, 32, 1), np.uint8))
        for _ in range(8)
    ]
    blobs = []
    for t in tiles:
        ok, enc = cv2.imencode(".jpg", t[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        assert ok
        blobs.append(enc.tobytes())
    out = dec.decode_jpeg_batch(blobs, 256, 256)
    assert out is not None and out.shape == (8, 256, 256, 3)
    for ours, golden_src in zip(out, blobs):
        ref = cv2.imdecode(np.frombuffer(golden_src, np.uint8), cv2.IMREAD_COLOR)[:, :, ::-1]
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def test_native_decoder_stale_so_degrades_to_base_path():
    """A prebuilt .so that predates the planar/nearest symbols must keep the
    base JPEG fast path alive and fail ONLY the newer entry points (binding
    them unguarded would AttributeError in __init__ and lose native
    entirely)."""
    import cv2

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder

    try:
        dec = NativeTileDecoder()
    except Exception:
        pytest.skip("native decoder unavailable")
    dec._has_opts = False
    dec._has_planar = False
    tile = np.full((64, 64, 3), 200, np.uint8)
    ok, enc = cv2.imencode(".jpg", tile[:, :, ::-1])
    assert ok
    blobs = [enc.tobytes()]
    out = dec.decode_jpeg_batch(blobs, 64, 64)
    assert out is not None and out.shape == (1, 64, 64, 3)  # base path alive
    assert dec.decode_jpeg_batch_nearest(blobs, 64, 64) is None
    assert dec.decode_jpeg_batch_planar(blobs, 64, 64) is None
    y, c, okf = dec.decode_jpeg_batch_planar(blobs, 64, 64, return_ok=True)
    assert not okf.any() and y.shape == (1, 64, 64) and c.shape == (1, 32, 32, 2)


def test_native_refuses_foreign_so_when_rebuild_fails(monkeypatch):
    """A failed host-change rebuild must NOT fall back to loading the old
    host's -march=native .so: that path dies by uncatchable SIGILL at first
    decode, while raising here routes callers to the cv2 fallback."""
    from path_gene_multimodal_tpu.io import native as nat

    try:
        nat.build_native()
    except Exception:
        pytest.skip("native toolchain unavailable")
    hostfile = nat._NATIVE_DIR / ".buildhost"
    original = hostfile.read_text()

    def boom(force=False):
        raise RuntimeError("compiler unavailable")

    monkeypatch.setattr(nat, "build_native", boom)
    try:
        # matching sidecar: the existing .so is from THIS host → usable
        assert nat.NativeTileDecoder() is not None
        # mismatched sidecar: refuse the foreign binary
        hostfile.write_text("someoldhost\n")
        with pytest.raises(RuntimeError, match="different CPU"):
            nat.NativeTileDecoder()
    finally:
        hostfile.write_text(original)


def test_build_native_compiles_via_temp_then_replace(monkeypatch):
    """Fleet-startup rebuilds run concurrently in every worker (the host-key
    check fails in all of them after a migration): g++ must never write the
    final .so path directly, or a sibling's CDLL can map a half-written
    file."""
    import subprocess as sp
    from pathlib import Path

    from path_gene_multimodal_tpu.io import native as nat

    try:
        nat.build_native()
    except Exception:
        pytest.skip("native toolchain unavailable")
    seen = {}
    real_so = nat._LIB_PATH.read_bytes()

    def fake_run(cmd, check, capture_output):
        out = cmd[cmd.index("-o") + 1]
        seen["out"] = out
        Path(out).write_bytes(real_so)  # a "compile" that produces the lib
        return sp.CompletedProcess(cmd, 0)

    monkeypatch.setattr(nat.subprocess, "run", fake_run)
    nat.build_native(force=True)
    assert seen["out"] != str(nat._LIB_PATH)
    assert seen["out"].endswith(".so.tmp")
    assert not Path(seen["out"]).exists()  # temp cleaned up after replace
    assert nat._LIB_PATH.read_bytes() == real_so


def test_native_rebuilds_on_host_change(tmp_path):
    """-march=native binaries from a PREVIOUS host can SIGILL after a
    container migration even when the source mtime says fresh — a
    .buildhost sidecar records the build CPU and forces a rebuild on
    mismatch (same microarch key as the jaxsetup compile cache)."""
    from path_gene_multimodal_tpu.io import native as nat

    try:
        nat.build_native()
    except Exception:
        pytest.skip("native toolchain unavailable")
    hostfile = nat._NATIVE_DIR / ".buildhost"
    assert hostfile.exists()
    before = nat._LIB_PATH.stat().st_mtime_ns
    # same host, fresh .so → no rebuild
    nat.build_native()
    assert nat._LIB_PATH.stat().st_mtime_ns == before
    # simulate a migrated container: key mismatch → rebuild
    original = hostfile.read_text()
    try:
        hostfile.write_text("someoldhost\n")
        nat.build_native()
        assert nat._LIB_PATH.stat().st_mtime_ns > before
        assert hostfile.read_text().strip() == original.strip()
    finally:
        hostfile.write_text(original)


def test_native_decoder_deflate():
    import zlib

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder

    try:
        dec = NativeTileDecoder()
    except Exception:
        pytest.skip("native decoder unavailable")
    rng = np.random.default_rng(3)
    tiles = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(4)]
    blobs = [zlib.compress(t.tobytes()) for t in tiles]
    out = dec.decode_deflate_batch(blobs, 64, 64)
    assert out is not None
    np.testing.assert_array_equal(out, np.stack(tiles))


def _patch_jpeg_sof_dims(blob: bytes, h: int, w: int) -> bytes:
    """Rewrite the SOF0/SOF2 height/width fields of an encoded JPEG —
    produces a corrupt blob whose header CLAIMS the given dims."""
    buf = bytearray(blob)
    i = 2
    while i + 4 <= len(buf):
        assert buf[i] == 0xFF
        marker = buf[i + 1]
        seg_len = (buf[i + 2] << 8) | buf[i + 3]
        if marker in (0xC0, 0xC2):  # SOF0 / SOF2: len(2) prec(1) h(2) w(2)
            buf[i + 5] = (h >> 8) & 0xFF
            buf[i + 6] = h & 0xFF
            buf[i + 7] = (w >> 8) & 0xFF
            buf[i + 8] = w & 0xFF
            return bytes(buf)
        i += 2 + seg_len
    raise AssertionError("no SOF marker found")


def test_native_decoder_rejects_corrupt_huge_dims():
    """A corrupt JPEG header claiming huge dims must fail that tile (not
    allocate multi-GB raw-plane scratch → bad_alloc → std::terminate, which
    would take the whole interpreter down from inside a pool thread)."""
    import cv2

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder

    try:
        dec = NativeTileDecoder()
    except Exception:
        pytest.skip("native decoder unavailable")
    tile = np.full((224, 224, 3), 180, np.uint8)
    ok, enc = cv2.imencode(".jpg", tile[:, :, ::-1])
    assert ok
    good = enc.tobytes()
    corrupt = _patch_jpeg_sof_dims(good, 65500, 65500)
    # whole-batch RGB decode fails closed (caller falls back per-tile)
    assert dec.decode_jpeg_batch([corrupt], 224, 224) is None
    # mixed planar batch keeps the good tile and flags only the corrupt one
    y, c, okf = dec.decode_jpeg_batch_planar(
        [good, corrupt], 224, 224, return_ok=True
    )
    assert okf.tolist() == [True, False]
    assert int(y[0].min()) > 0  # the good tile actually decoded
    # mildly-oversized claims stay within the ≤2×-tile crop tolerance: the
    # header passes the bound and libjpeg decodes leniently (premature scan
    # end is a libjpeg warning, not an error) — must not crash either way
    mild = _patch_jpeg_sof_dims(good, 300, 300)
    out = dec.decode_jpeg_batch([mild], 224, 224)
    assert out is None or out.shape == (1, 224, 224, 3)


def test_tiff_native_batch_matches_python(tmp_path):
    rng = np.random.default_rng(4)
    base = np.kron(
        rng.integers(40, 220, size=(8, 8, 3), dtype=np.uint8), np.ones((64, 64, 1), np.uint8)
    )
    p = write_tiled_tiff(tmp_path / "j.svs", [base], tile_size=256, compression=7)
    slide = TiffTileSlide(p, use_native=True)
    page = slide._pages[0]
    ids = np.arange(len(page.offsets))
    batch = slide.read_tiles_batch(0, ids)
    ref = np.stack([slide._decode_tile(page, int(i)) for i in ids])
    assert np.abs(batch.astype(int) - ref.astype(int)).max() <= 16  # decoder rounding


def test_prefetch_region_matches_python(tmp_path):
    rng = np.random.default_rng(7)
    base = np.kron(
        rng.integers(40, 220, size=(8, 10, 3), dtype=np.uint8), np.ones((64, 64, 1), np.uint8)
    )
    p = write_tiled_tiff(tmp_path / "pf.svs", [base], tile_size=256, compression=7)
    plain = TiffTileSlide(p, use_native=False)
    golden = plain.read_region((100, 100), 0, (300, 300))
    fast = TiffTileSlide(p, use_native=True)
    if fast._native is None:
        pytest.skip("native decoder unavailable")
    n = fast.prefetch_regions(np.array([[100, 100]]), 0, (300, 300))
    assert n >= 4  # covered TIFF tiles decoded in one native batch
    region = fast.read_region((100, 100), 0, (300, 300))
    # native libjpeg vs cv2 may differ by DCT rounding only
    assert np.abs(region.astype(int) - golden.astype(int)).max() <= 16
    # second prefetch: everything cached
    assert fast.prefetch_regions(np.array([[100, 100]]), 0, (300, 300)) == 0
    # exact coverage: two disjoint far-apart regions decode only their own
    # tiles (4 + ≤4), not the bounding-box span
    fast2 = TiffTileSlide(p, use_native=True)
    n2 = fast2.prefetch_regions(np.array([[0, 0], [500, 300]]), 0, (100, 100))
    assert n2 <= 5


def test_predictor2_horizontal_differencing():
    """TIFF Predictor=2 (tag 317) rows must be un-differenced before use."""
    from path_gene_multimodal_tpu.io.tiff import _raw_to_rgb

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
    diff = img.astype(np.int16).copy()
    diff[:, 1:] -= img[:, :-1].astype(np.int16)
    raw = (diff % 256).astype(np.uint8).tobytes()
    out = _raw_to_rgb(raw, 32, 48, 3, predictor=2)
    np.testing.assert_array_equal(out, img)
    # predictor=1 leaves bytes untouched
    out1 = _raw_to_rgb(img.tobytes(), 32, 48, 3, predictor=1)
    np.testing.assert_array_equal(out1, img)


# -- planar (4:2:0) device-feed path -----------------------------------------


def _smooth_jpeg_slide(tmp_path, name="planar.svs", gh=8, gw=8, seed=11):
    rng = np.random.default_rng(seed)
    base = np.kron(
        rng.integers(40, 220, size=(gh, gw, 3), dtype=np.uint8),
        np.ones((64, 64, 1), np.uint8),
    )
    p = write_tiled_tiff(tmp_path / name, [base], tile_size=256, compression=7)
    return base, p


def _nearest_tile_canvas(slide):
    """Golden: assemble the whole level-0 plane from per-TIFF-tile
    nearest-upsample RGB decodes (libjpeg merged path — the exact semantics
    the planar device feed must reproduce bit-for-bit)."""
    page = slide._pages[0]
    blobs = [slide._tile_bytes(page, i) for i in range(len(page.offsets))]
    rgb = slide._native.decode_jpeg_batch_nearest(
        blobs, page.tile_height, page.tile_width, page.jpeg_tables
    )
    assert rgb is not None
    th, tw = page.tile_height, page.tile_width
    canvas = np.full((page.tiles_down * th, page.tiles_across * tw, 3), 255, np.uint8)
    for i in range(len(blobs)):
        ty, tx = divmod(i, page.tiles_across)
        canvas[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw] = rgb[i]
    return canvas


def test_planar_region_bitexact_vs_nearest(tmp_path):
    from path_gene_multimodal_tpu.ops.jpegcolor import ycbcr420_to_rgb

    _, p = _smooth_jpeg_slide(tmp_path)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    assert slide.supports_planar(0)
    golden = _nearest_tile_canvas(slide)
    # tile-aligned and unaligned (but even) cross-tile regions
    for (x0, y0), (w, h) in [((0, 0), (512, 512)), ((100, 100), (300, 200)),
                             ((224, 256), (224, 224))]:
        planes = slide.read_region_planar((x0, y0), 0, (w, h))
        assert planes is not None
        y, cbcr = planes
        assert y.shape == (h, w) and cbcr.shape == (h // 2, w // 2, 2)
        rgb = np.asarray(ycbcr420_to_rgb(y, cbcr))
        np.testing.assert_array_equal(rgb, golden[y0 : y0 + h, x0 : x0 + w])


def test_planar_close_to_default_decode(tmp_path):
    """Nearest vs fancy chroma upsampling differ only in chroma
    interpolation — on smooth content (chroma gradients of ~1 level per
    sample) the RGB delta stays within the DCT-rounding band the other
    decoder parity tests allow. (Hard chroma edges can differ by more —
    that's inherent to the upsampler choice and documented in
    ops/jpegcolor.py.)"""
    from path_gene_multimodal_tpu.ops.jpegcolor import ycbcr420_to_rgb

    yy, xx = np.mgrid[0:512, 0:512].astype(np.float64)
    base = np.stack(
        [100 + 50 * np.sin(yy / 90), 120 + 40 * np.cos(xx / 110),
         90 + 30 * np.sin((xx + yy) / 150)], axis=-1
    ).astype(np.uint8)
    p = write_tiled_tiff(tmp_path / "grad.svs", [base], tile_size=256,
                         compression=7)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    default = slide.read_region((128, 64), 0, (320, 256))
    y, cbcr = slide.read_region_planar((128, 64), 0, (320, 256))
    rgb = np.asarray(ycbcr420_to_rgb(y, cbcr))
    assert np.abs(rgb.astype(int) - default.astype(int)).max() <= 16


def test_planar_fallback_cases(tmp_path):
    _, p = _smooth_jpeg_slide(tmp_path, seed=13)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    # odd geometry → None (chroma crops would not commute)
    assert slide.read_region_planar((101, 100), 0, (224, 224)) is None
    assert slide.read_region_planar((100, 100), 0, (225, 224)) is None
    # non-JPEG page → unsupported
    img = np.full((300, 300, 3), 90, np.uint8)
    pz = write_tiled_tiff(tmp_path / "z.tif", [img], tile_size=256, compression=8)
    sz = TiffTileSlide(pz, use_native=True)
    assert not sz.supports_planar(0)
    assert sz.read_region_planar((0, 0), 0, (256, 256)) is None


def test_iter_tile_batches_planar(tmp_path):
    from path_gene_multimodal_tpu.ops.jpegcolor import ycbcr420_to_rgb
    from path_gene_multimodal_tpu.pipeline.tessellate import iter_tile_batches

    _, p = _smooth_jpeg_slide(tmp_path, seed=14)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    golden = _nearest_tile_canvas(slide)
    side = np.arange(0, 512 - 224, 224)
    coords = np.stack(np.meshgrid(side, side), -1).reshape(-1, 2).astype(np.int64)
    batches = list(
        iter_tile_batches(slide, coords, 224, 3, pad_to_batch=True, planar=True)
    )
    flat_rgb, flat_valid = [], []
    for (yb, cb), valid in batches:
        assert yb.shape[1:] == (224, 224) and cb.shape[1:] == (112, 112, 2)
        flat_rgb.append(np.asarray(ycbcr420_to_rgb(yb, cb)))
        flat_valid.append(valid)
    flat_rgb = np.concatenate(flat_rgb)
    flat_valid = np.concatenate(flat_valid)
    assert flat_valid.sum() == len(coords)
    for i, (x, y) in enumerate(coords):
        np.testing.assert_array_equal(
            flat_rgb[i], golden[y : y + 224, x : x + 224]
        )


def test_planar_prefetch_fills_cache(tmp_path):
    _, p = _smooth_jpeg_slide(tmp_path, seed=15)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    n = slide.prefetch_regions_planar(np.array([[100, 100]]), 0, (300, 300))
    assert n >= 4
    assert slide.prefetch_regions_planar(np.array([[100, 100]]), 0, (300, 300)) == 0


def test_planar_decoder_undersized_edge_tile():
    """Real SVS edge tiles are often encoded smaller than the tile grid —
    the planar decoder must white-pad (Y=255, Cb=Cr=128) exactly like the
    RGB path pads (255,255,255)."""
    import cv2

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder
    from path_gene_multimodal_tpu.ops.jpegcolor import ycbcr420_to_rgb

    rng = np.random.default_rng(21)
    img = np.kron(
        rng.integers(40, 220, size=(5, 4, 3), dtype=np.uint8),
        np.ones((40, 50, 1), np.uint8),
    )  # 200 x 200 encoded into a 256-px tile slot
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    dec = NativeTileDecoder()
    out = dec.decode_jpeg_batch_planar([enc.tobytes()], 256, 256)
    assert out is not None
    y, cbcr = out
    rgb = np.asarray(ycbcr420_to_rgb(y[0], cbcr[0]))
    near = dec.decode_jpeg_batch_nearest([enc.tobytes()], 256, 256)[0]
    np.testing.assert_array_equal(rgb, near)
    np.testing.assert_array_equal(rgb[200:], 255)  # white pad below
    np.testing.assert_array_equal(rgb[:, 200:], 255)  # white pad right


def test_planar_decoder_rejects_non_420():
    """4:4:4-sampled JPEG → planar decode fails (caller falls back to RGB)."""
    import cv2

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder

    img = np.full((256, 256, 3), 120, np.uint8)
    ok, enc = cv2.imencode(
        ".jpg", img,
        [cv2.IMWRITE_JPEG_QUALITY, 90,
         cv2.IMWRITE_JPEG_SAMPLING_FACTOR, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444],
    )
    assert ok
    dec = NativeTileDecoder()
    assert dec.decode_jpeg_batch_planar([enc.tobytes()], 256, 256) is None
    # and the plain RGB path still decodes it
    assert dec.decode_jpeg_batch([enc.tobytes()], 256, 256) is not None


def test_planar_decoder_rejects_odd_dims():
    """Odd encoded width/height → planar decode fails (→ RGB fallback): the
    chroma sample straddling the content/pad boundary is real, so the first
    pad column would reconstruct tinted instead of white and break parity
    with the RGB path's exact (255,255,255) pad."""
    import cv2

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder

    rng = np.random.default_rng(31)
    img = np.kron(
        rng.integers(40, 220, size=(4, 3, 3), dtype=np.uint8),
        np.ones((50, 67, 1), np.uint8),
    )  # 200 x 201 — odd width — encoded into a 256-px slot
    ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
    assert ok
    dec = NativeTileDecoder()
    assert dec.decode_jpeg_batch_planar([enc.tobytes()], 256, 256) is None
    # the RGB path still serves the tile, with exact white padding
    rgb = dec.decode_jpeg_batch([enc.tobytes()], 256, 256)
    assert rgb is not None
    np.testing.assert_array_equal(rgb[0][:, 201:], 255)


def test_iter_tile_batches_planar_odd_chunk_falls_back(tmp_path):
    """A chunk the planar path cannot serve (odd coords here) degrades to
    the RGB ndarray payload instead of raising — consumers discriminate by
    isinstance(payload, tuple)."""
    from path_gene_multimodal_tpu.pipeline.tessellate import iter_tile_batches

    _, p = _smooth_jpeg_slide(tmp_path, seed=16)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    assert slide.supports_planar(0)
    coords = np.array([[0, 0], [224, 0], [101, 100]], np.int64)  # last is odd
    payloads = list(
        iter_tile_batches(slide, coords, 224, 2, pad_to_batch=True, planar=True)
    )
    assert len(payloads) == 2
    first, second = payloads[0][0], payloads[1][0]
    assert isinstance(first, tuple)  # even chunk streams planar
    assert isinstance(second, np.ndarray) and second.shape == (2, 224, 224, 3)
    np.testing.assert_array_equal(
        second[0], slide.read_region((101, 100), 0, (224, 224))
    )


def test_tile_cache_shared_budget(tmp_path):
    """RGB and planar cache entries share ONE LRU budget (the memory
    ceiling stays ~cap x tile bytes even when both feeds run on a slide)."""
    _, p = _smooth_jpeg_slide(tmp_path, seed=17)
    slide = TiffTileSlide(p, use_native=True, cache_tiles=6)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    slide.prefetch_regions(np.array([[0, 0]]), 0, (512, 512))        # 4 RGB tiles
    slide.prefetch_regions_planar(np.array([[0, 0]]), 0, (512, 512))  # +4 planar
    assert len(slide._cache) <= 6  # shared budget evicted the overflow
    kinds = {k[0] for k in slide._cache}
    assert kinds == {"rgb", "p"}


def test_planar_batch_return_ok_mixed():
    """return_ok=True keeps the good tiles of a mixed batch (one 4:2:0,
    one 4:4:4) instead of discarding the whole batch."""
    import cv2

    from path_gene_multimodal_tpu.io.native import NativeTileDecoder

    img = np.full((256, 256, 3), 120, np.uint8)
    ok1, good = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    ok2, bad = cv2.imencode(
        ".jpg", img,
        [cv2.IMWRITE_JPEG_QUALITY, 90,
         cv2.IMWRITE_JPEG_SAMPLING_FACTOR, cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444],
    )
    assert ok1 and ok2
    dec = NativeTileDecoder()
    y, cbcr, ok = dec.decode_jpeg_batch_planar(
        [good.tobytes(), bad.tobytes()], 256, 256, return_ok=True
    )
    assert ok.tolist() == [True, False]
    y1, c1 = dec.decode_jpeg_batch_planar([good.tobytes()], 256, 256)
    np.testing.assert_array_equal(y[0], y1[0])
    np.testing.assert_array_equal(cbcr[0], c1[0])
    # default contract unchanged: None when any tile fails
    assert dec.decode_jpeg_batch_planar([good.tobytes(), bad.tobytes()], 256, 256) is None


def test_planar_failure_memoized(tmp_path):
    """A tile the planar decoder rejects is cached as a failure sentinel —
    later regions touching it fall back to RGB WITHOUT re-decoding it."""
    _, p = _smooth_jpeg_slide(tmp_path, seed=18)
    slide = TiffTileSlide(p, use_native=True)
    if slide._native is None:
        pytest.skip("native decoder unavailable")
    calls = []
    orig = slide._native.decode_jpeg_batch_planar

    def spy(*a, **k):
        calls.append(1)
        return None  # pretend every tile is non-4:2:0

    slide._native.decode_jpeg_batch_planar = spy
    try:
        assert slide.read_region_planar((0, 0), 0, (224, 224)) is None
        n1 = len(calls)
        assert n1 >= 1
        assert slide.read_region_planar((0, 0), 0, (224, 224)) is None
        assert len(calls) == n1  # sentinel short-circuited the re-decode
    finally:
        slide._native.decode_jpeg_batch_planar = orig


@pytest.mark.parametrize("case", ["empty", "bad_magic", "truncated_header",
                                  "huge_ifd_count", "ifd_loop"])
def test_tiff_malformed_inputs_raise_cleanly(tmp_path, case):
    """The from-scratch parser must fail CLOSED on malformed files — a clean
    exception, never a hang, unbounded allocation, or interpreter crash
    (batch loops catch per-slide errors and continue; ref main.py:118-125)."""
    import struct

    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide

    p = tmp_path / f"{case}.svs"
    if case == "empty":
        p.write_bytes(b"")
    elif case == "bad_magic":
        p.write_bytes(b"II\x99\x00" + b"\x00" * 64)
    elif case == "truncated_header":
        p.write_bytes(b"II*\x00\x08\x00\x00")  # 4-byte offset cut short
    elif case == "huge_ifd_count":
        # IFD claims 65535 entries but the file ends immediately after
        p.write_bytes(b"II*\x00\x08\x00\x00\x00" + struct.pack("<H", 0xFFFF))
    elif case == "ifd_loop":
        # IFD with 0 entries whose next-IFD pointer points at itself
        p.write_bytes(
            b"II*\x00\x08\x00\x00\x00"
            + struct.pack("<H", 0)
            + struct.pack("<I", 8)
        )
    with pytest.raises(Exception) as ei:
        TiffTileSlide(p)
    assert not isinstance(ei.value, (MemoryError, RecursionError, SystemError))


def test_tiff_oversize_tag_count_rejected(tmp_path):
    """A tag whose claimed value size exceeds the file must raise, not
    attempt a multi-gigabyte read."""
    import struct

    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide

    # one IFD, one LONG tag claiming 2^28 values (1 GiB of data)
    entry = struct.pack("<HHI", 256, 4, 1 << 28) + struct.pack("<I", 64)
    p = tmp_path / "oversize.svs"
    p.write_bytes(
        b"II*\x00\x08\x00\x00\x00" + struct.pack("<H", 1) + entry
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="corrupt"):
        TiffTileSlide(p)


def test_tiff_header_fuzz_fails_closed(tmp_path):
    """Seeded corruption sweep over a valid SVS: every mutated file must
    either work or raise a clean exception — never hang, exhaust memory, or
    crash the interpreter (generalizes the targeted malformed-input cases:
    production batch loops feed whatever bytes the filesystem hands them)."""
    import signal

    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide

    rng = np.random.default_rng(1234)
    img = np.kron(
        rng.integers(40, 220, (4, 4, 3), np.uint8), np.ones((128, 128, 1), np.uint8)
    )
    src = tmp_path / "base.svs"
    write_tiled_tiff(src, [img], tile_size=256, compression=7)
    data = bytearray(src.read_bytes())
    n = len(data)

    def exercise(path):
        slide = TiffTileSlide(path)
        slide.read_region((0, 0), 0, (96, 96))
        slide.read_tiles_batch(0, np.array([0]))

    cases = []
    # byte flips weighted to the structured head/tail (IFDs live there)
    for _ in range(120):
        k = int(rng.integers(1, 5))
        zone = rng.integers(0, 3)
        lo, hi = [(0, min(2048, n)), (max(0, n - 2048), n), (0, n)][zone]
        cases.append(("flip", rng.integers(lo, hi, size=k).tolist()))
    for _ in range(25):
        cases.append(("trunc", int(rng.integers(0, n))))
    for _ in range(25):
        cases.append(("zero", int(rng.integers(0, max(1, n - 16)))))

    def _timed_out(signum, frame):  # fail THIS test, don't kill pytest
        raise TimeoutError("fuzz sweep exceeded its 300 s bound")

    old_handler = signal.signal(signal.SIGALRM, _timed_out)
    old = signal.alarm(300)  # the whole sweep must stay promptly bounded
    try:
        for i, (kind, arg) in enumerate(cases):
            buf = bytearray(data)
            if kind == "flip":
                for pos in arg:
                    buf[pos] ^= int(rng.integers(1, 256))
            elif kind == "trunc":
                buf = buf[:arg]
            else:
                buf[arg : arg + 16] = b"\x00" * 16
            p = tmp_path / "fuzz.svs"
            p.write_bytes(bytes(buf))
            try:
                exercise(p)
            except Exception as e:  # clean failure is the contract
                assert not isinstance(
                    e, (MemoryError, RecursionError, SystemError)
                ), f"case {i} ({kind}, {arg}): {type(e).__name__}: {e}"
    finally:
        signal.alarm(old)
        signal.signal(signal.SIGALRM, old_handler)


@pytest.mark.parametrize("bigtiff", [False, True])
def test_striped_tiff_header_fuzz_fails_closed(tmp_path, bigtiff):
    """Same fail-closed contract over the STRIPED parsing path (tags
    273/278/279 → degenerate-tile pages), in BOTH containers (classic and
    BigTIFF 64-bit IFDs): corrupt RowsPerStrip/offsets/counts must never
    hang, exhaust memory, or crash."""
    import signal

    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiff_pages

    rng = np.random.default_rng(4321)
    img = np.kron(
        rng.integers(40, 220, (4, 4, 3), np.uint8), np.ones((64, 64, 1), np.uint8)
    )
    src = tmp_path / "base.tif"
    write_tiff_pages(
        src,
        [{"img": img, "layout": "striped", "rows_per_strip": 48,
          "compression": 8}],
        bigtiff=bigtiff,
    )
    data = bytearray(src.read_bytes())
    n = len(data)

    def exercise(path):
        slide = TiffTileSlide(path)
        slide.read_region((0, 0), 0, (96, 96))

    cases = []
    for _ in range(80):
        k = int(rng.integers(1, 5))
        zone = rng.integers(0, 3)
        lo, hi = [(0, min(2048, n)), (max(0, n - 2048), n), (0, n)][zone]
        cases.append(("flip", rng.integers(lo, hi, size=k).tolist()))
    for _ in range(15):
        cases.append(("trunc", int(rng.integers(0, n))))
    for _ in range(15):
        cases.append(("zero", int(rng.integers(0, max(1, n - 16)))))

    def _timed_out(signum, frame):
        raise TimeoutError("striped fuzz sweep exceeded its 300 s bound")

    old_handler = signal.signal(signal.SIGALRM, _timed_out)
    old = signal.alarm(300)
    try:
        for i, (kind, arg) in enumerate(cases):
            buf = bytearray(data)
            if kind == "flip":
                for pos in arg:
                    buf[pos] ^= int(rng.integers(1, 256))
            elif kind == "trunc":
                buf = buf[:arg]
            else:
                buf[arg : arg + 16] = b"\x00" * 16
            p = tmp_path / "fuzz.tif"
            p.write_bytes(bytes(buf))
            try:
                exercise(p)
            except Exception as e:
                assert not isinstance(
                    e, (MemoryError, RecursionError, SystemError)
                ), f"case {i} ({kind}, {arg}): {type(e).__name__}: {e}"
    finally:
        signal.alarm(old)
        signal.signal(signal.SIGALRM, old_handler)


def test_raw_codec_rejects_exotic_layouts(tmp_path):
    """Raw/deflate pages with separate sample planes (PlanarConfiguration=2)
    or palette/YCbCr photometrics would decode as scrambled pixels if
    reshaped chunky — the reader must fail closed, not emit garbage."""
    import dataclasses
    import struct as _struct

    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_striped_tiff

    img = np.full((128, 128, 3), 77, np.uint8)
    p = write_striped_tiff(tmp_path / "pc.tif", [img], rows_per_strip=64,
                           compression=8)
    # photometric gate: patch tag 262's inline value 2 (RGB) → 3 (palette)
    data = bytearray(p.read_bytes())
    needle = _struct.pack("<HHII", 262, 3, 1, 2)
    pos = bytes(data).find(needle)
    assert pos > 0
    data[pos:pos + 12] = _struct.pack("<HHII", 262, 3, 1, 3)
    bad = tmp_path / "pal.tif"
    bad.write_bytes(bytes(data))
    # strip-backed pyramid → the constructor preflights decodability, so
    # open_slide's cv2 whole-image fallback can still rescue such files
    with pytest.raises(ValueError, match="photometric"):
        TiffTileSlide(bad)
    # planar-config gate (tag 284=2): exercised at the page level
    slide = TiffTileSlide(p)
    slide._pages[0] = dataclasses.replace(slide._pages[0], planar_config=2)
    with pytest.raises(ValueError, match="PlanarConfiguration"):
        slide.read_region((0, 0), 0, (64, 64))
    slide.close()


def test_strip_cache_byte_budget(tmp_path):
    """The decoded-tile LRU is budgeted in bytes as well as entries:
    full-width strips (hundreds of KB to tens of MB each) must not ride
    an entry-count cap into multi-GB residency."""
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_striped_tiff

    img = np.random.default_rng(2).integers(0, 255, (384, 1024, 3), np.uint8)
    p = write_striped_tiff(tmp_path / "b.tif", [img], rows_per_strip=128)
    # each strip decodes to 1024*128*3 = 393,216 B; cache_tiles=3 → byte
    # cap 3*196,608 = 589,824 B → at most ONE strip stays cached
    slide = TiffTileSlide(p, cache_tiles=3)
    np.testing.assert_array_equal(
        slide.read_region((0, 0), 0, (1024, 384)), img
    )
    assert slide._cache_bytes <= slide._cache_bytes_cap
    assert len(slide._cache) <= 1
    slide.close()
    # normal tiled slides keep the old behavior: 256² tiles fill the
    # entry cap exactly at the byte cap
    pt = write_tiled_tiff(tmp_path / "t.tif", [img], tile_size=256)
    st = TiffTileSlide(pt, cache_tiles=8)
    st.read_region((0, 0), 0, (1024, 384))
    assert len(st._cache) == 8 and st._cache_bytes <= st._cache_bytes_cap
    st.close()


def test_read_tiles_batch_strips_pad_to_geometry(tmp_path):
    """read_tiles_batch stacks fixed-size arrays; a short last strip must
    white-pad to the declared strip geometry instead of crashing."""
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_striped_tiff

    img = np.random.default_rng(3).integers(0, 255, (150, 300, 3), np.uint8)
    p = write_striped_tiff(tmp_path / "p.tif", [img], rows_per_strip=64)
    slide = TiffTileSlide(p)
    batch = slide.read_tiles_batch(0, np.array([0, 2]))  # last strip = 22 rows
    assert batch.shape == (2, 64, 300, 3)
    np.testing.assert_array_equal(batch[1, :22], img[128:150])
    assert (batch[1, 22:] == 255).all()
    slide.close()


def test_bigtiff_roundtrip(tmp_path):
    """BigTIFF (magic 43, 64-bit offsets, 20-byte entries — the Ventana/
    Philips WSI container) parses through the same reader: the branch was
    previously implemented but had zero fixtures. Covers inline-capacity
    deltas (3xSHORT BitsPerSample inlines in BigTIFF, 2xLONG offsets
    inline, bigger arrays go out-of-line) in tiled and striped layouts."""
    from path_gene_multimodal_tpu.io.tiff import TiffTileSlide
    from path_gene_multimodal_tpu.io.tiff_write import write_tiff_pages

    rng = np.random.default_rng(11)
    base = rng.integers(0, 255, (512, 768, 3), np.uint8)
    p = write_tiff_pages(
        tmp_path / "big.tif",
        [
            {"img": base, "layout": "tiled", "tile_size": 256,
             "description": "BigTIFF fixture |MPP = 0.3|"},
            {"img": base[::2, ::2], "layout": "tiled", "tile_size": 256},
        ],
        bigtiff=True,
    )
    assert p.read_bytes()[2:4] == b"+\x00"  # really BigTIFF magic 43
    slide = TiffTileSlide(p)
    assert slide.level_dimensions == [(768, 512), (384, 256)]
    assert slide.mpp == 0.3
    np.testing.assert_array_equal(
        slide.read_region((100, 100), 0, (300, 200)), base[100:300, 100:400]
    )
    np.testing.assert_array_equal(
        slide.read_region((0, 0), 1, (384, 256)), base[::2, ::2]
    )
    slide.close()

    # striped BigTIFF, both inline regimes: a single-strip page (1xLONG
    # offsets INLINE in the 8-byte field) and a multi-strip page with a
    # short last strip (3xLONG = 12 B, out-of-line)
    img = rng.integers(0, 255, (150, 200, 3), np.uint8)
    ps = write_tiff_pages(
        tmp_path / "bigs.tif",
        [
            {"img": img, "layout": "striped", "rows_per_strip": 192},
            {"img": img[::2, ::2], "layout": "striped", "rows_per_strip": 32},
        ],
        bigtiff=True,
    )
    ss = TiffTileSlide(ps)
    assert ss._pages[0].tiles_down == 1  # really ONE strip → inline offsets
    np.testing.assert_array_equal(ss.read_region((0, 0), 0, (200, 150)), img)
    np.testing.assert_array_equal(
        ss.read_region((0, 0), 1, (100, 75)), img[::2, ::2]
    )
    ss.close()


def test_thumbnail_bandwise_matches_oneshot(tmp_path, monkeypatch):
    """Above the one-shot byte budget get_thumbnail reads in bands; the
    banded result must match the one-shot resize (single-level WSIs would
    otherwise materialize the whole base image for a 2000-px thumbnail)."""
    import path_gene_multimodal_tpu.io.tiff as tiffmod

    img = np.random.default_rng(4).integers(0, 255, (600, 800, 3), np.uint8)
    p = write_tiled_tiff(tmp_path / "one.tif", [img], tile_size=256)  # 1 level
    slide = tiffmod.TiffTileSlide(p)
    ref = slide.get_thumbnail((200, 200))
    monkeypatch.setattr(tiffmod, "_THUMB_ONESHOT_BYTES", 1 << 18)  # force bands
    banded = slide.get_thumbnail((200, 200))
    assert banded.shape == ref.shape
    # band-boundary resampling differs by at most a hair from one-shot
    assert np.abs(banded.astype(int) - ref.astype(int)).mean() < 2.0
    slide.close()


def test_write_tiled_tiff_unsupported_compression(tmp_path):
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="unsupported write compression"):
        write_tiled_tiff(tmp_path / "bad.tif", [img], tile_size=64, compression=5)


def test_array_slide_save_returns_real_path(tmp_path, small_slide):
    p = small_slide.save(tmp_path / "fixture")  # no .npz suffix
    assert p.exists() and p.name == "fixture.npz"
    loaded = open_slide(p)
    assert loaded.level_dimensions[0] == small_slide.level_dimensions[0]


def test_open_slide_npy_input(tmp_path):
    """The reference's 'npy' input type (hovernet_inference.py:72-74):
    raw (H, W, 3) arrays open as slides; grayscale broadcasts to RGB;
    non-image shapes are rejected."""
    import numpy as np
    import pytest

    rgb = np.random.default_rng(0).integers(0, 255, (64, 48, 3), np.uint8)
    p = tmp_path / "img.npy"
    np.save(p, rgb)
    s = open_slide(p)
    np.testing.assert_array_equal(s.read_region((0, 0), 0, (48, 64)), rgb)

    gray = rgb[..., 0]
    np.save(tmp_path / "gray.npy", gray)
    g = open_slide(tmp_path / "gray.npy")
    np.testing.assert_array_equal(
        g.read_region((0, 0), 0, (48, 64)), np.stack([gray] * 3, axis=-1)
    )

    np.save(tmp_path / "bad.npy", np.zeros((4, 4, 4, 4), np.uint8))
    with pytest.raises(ValueError, match=r"bad.npy.*\(H, W, 3\)"):
        open_slide(tmp_path / "bad.npy")


def test_open_slide_npy_dtypes(tmp_path):
    """Non-uint8 arrays must not be silently truncated by a uint8 cast:
    unit-range floats scale to [0,255]; [0,255] floats/ints round/cast;
    out-of-range values are rejected with a clear error."""
    import numpy as np
    import pytest

    rgb = np.random.default_rng(1).integers(0, 255, (32, 32, 3), np.uint8)

    np.save(tmp_path / "unit.npy", rgb.astype(np.float64) / 255.0)
    s = open_slide(tmp_path / "unit.npy")
    got = s.read_region((0, 0), 0, (32, 32))
    assert np.abs(got.astype(int) - rgb.astype(int)).max() <= 1  # rint error

    np.save(tmp_path / "f255.npy", rgb.astype(np.float32))
    s = open_slide(tmp_path / "f255.npy")
    np.testing.assert_array_equal(s.read_region((0, 0), 0, (32, 32)), rgb)

    np.save(tmp_path / "i16.npy", rgb.astype(np.int16))
    s = open_slide(tmp_path / "i16.npy")
    np.testing.assert_array_equal(s.read_region((0, 0), 0, (32, 32)), rgb)

    np.save(tmp_path / "neg.npy", rgb.astype(np.float32) - 300.0)
    with pytest.raises(ValueError, match="expected uint8"):
        open_slide(tmp_path / "neg.npy")
    np.save(tmp_path / "big.npy", rgb.astype(np.uint16) + 300)
    with pytest.raises(ValueError, match="expected uint8"):
        open_slide(tmp_path / "big.npy")


def test_slide_info_cli(tmp_path, capsys):
    """pgm-tpu-slide-info: pyramid/codec metadata without touching JAX."""
    import json as _json

    import numpy as np

    from path_gene_multimodal_tpu.cli.slide_info import main as info_main
    from path_gene_multimodal_tpu.io.tiff_write import write_tiled_tiff

    rng = np.random.default_rng(5)
    lv0 = rng.integers(0, 255, (512, 768, 3), np.uint8)
    lv1 = lv0[::2, ::2]
    p = tmp_path / "s.svs"
    write_tiled_tiff(p, [lv0, lv1], tile_size=256, compression=7,
                     description="Aperio |MPP = 0.2500|")

    assert info_main([str(p), "--json"]) == 0
    out = capsys.readouterr().out.strip()
    info = _json.loads(out)
    assert info["level_dimensions"] == [[768, 512], [384, 256]]
    assert abs(info["mpp"] - 0.25) < 1e-9
    assert info["pages"][0]["codec"] == "JPEG"
    assert info["pages"][0]["tiles"] == [3, 2]
    assert isinstance(info["planar_feed_supported"], bool)

    # human output mentions the codec; unreadable file → rc 2
    assert info_main([str(p)]) == 0
    human = capsys.readouterr().out
    assert "JPEG" in human and "768x512" in human
    bad = tmp_path / "bad.svs"
    bad.write_bytes(b"not a tiff")
    assert info_main([str(bad)]) == 2
