"""stdlib zarr-v2 zip store: round-trips, format details, and the
``pinst_pp.zip`` / ``features.pt`` artifact contracts (VERDICT missing
#2/#3 — reference consumers: aggregated_hovernet_run.py:163-166,
hovernet_plotting.py:44-73, extract_embedding_from_tiles.py:70)."""

import json
import zipfile
import zlib

import numpy as np
import pytest

from path_gene_multimodal_tpu.io.zarrzip import read_zarr_zip, write_zarr_zip


@pytest.mark.parametrize(
    "shape,chunks,dtype",
    [
        ((1, 300, 500), (1, 128, 128), np.uint32),  # pinst_pp layout, edge chunks
        ((7, 9), (4, 4), np.float32),
        ((5,), (2,), np.int64),
        ((1, 2048, 2048), None, np.uint32),  # exactly one default chunk
        ((3, 3), (8, 8), np.uint8),  # chunk larger than array
    ],
)
def test_roundtrip(tmp_path, shape, chunks, dtype):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        arr = rng.integers(0, 1000, size=shape).astype(dtype)
    else:
        arr = rng.normal(size=shape).astype(dtype)
    p = tmp_path / "a.zip"
    write_zarr_zip(p, arr, chunks=chunks)
    back = read_zarr_zip(p)
    assert back.dtype == arr.dtype and back.shape == arr.shape
    np.testing.assert_array_equal(back, arr)


def test_uncompressed_roundtrip(tmp_path):
    arr = np.arange(24, dtype=np.uint32).reshape(2, 3, 4)
    p = tmp_path / "raw.zip"
    write_zarr_zip(p, arr, compress_level=0)
    with zipfile.ZipFile(p) as zf:
        meta = json.loads(zf.read(".zarray"))
        assert meta["compressor"] is None
        # raw chunk bytes are the C-order array bytes
        assert zf.read("0.0.0") == np.ascontiguousarray(arr[:1]).tobytes()
    np.testing.assert_array_equal(read_zarr_zip(p), arr)


def test_zarr_v2_format_details(tmp_path):
    """The zip must be a spec-correct zarr v2 store: .zarray JSON with the
    required keys, chunk keys 'i.j.k', edge chunks stored FULL-size."""
    arr = np.arange(10 * 6, dtype=np.uint32).reshape(1, 10, 6)
    p = tmp_path / "spec.zip"
    write_zarr_zip(p, arr, chunks=(1, 8, 4), compress_level=1)
    with zipfile.ZipFile(p) as zf:
        names = set(zf.namelist())
        assert names == {".zarray", "0.0.0", "0.0.1", "0.1.0", "0.1.1"}
        meta = json.loads(zf.read(".zarray"))
        assert meta["zarr_format"] == 2
        assert meta["dtype"] == "<u4"
        assert meta["shape"] == [1, 10, 6] and meta["chunks"] == [1, 8, 4]
        assert meta["order"] == "C" and meta["filters"] is None
        assert meta["fill_value"] == 0
        assert meta["compressor"] == {"id": "zlib", "level": 1}
        # edge chunk (rows 8:10, cols 4:6) is padded to full (1, 8, 4)
        blk = np.frombuffer(
            zlib.decompress(zf.read("0.1.1")), np.uint32
        ).reshape(1, 8, 4)
        np.testing.assert_array_equal(blk[0, :2, :2], arr[0, 8:10, 4:6])
        assert (blk[0, 2:, :] == 0).all() and (blk[0, :, 2:] == 0).all()


def test_read_gzip_coded_chunks(tmp_path):
    """numcodecs.GZip writes gzip-format streams (not zlib); the reader's
    whitelist accepts id 'gzip' so decode must handle both headers."""
    import gzip
    import json
    import zipfile

    import numpy as np

    from path_gene_multimodal_tpu.io.zarrzip import read_zarr_zip

    arr = np.arange(12, dtype=np.uint32).reshape(3, 4)
    meta = {
        "zarr_format": 2, "shape": [3, 4], "chunks": [3, 4],
        "dtype": arr.dtype.str, "order": "C", "fill_value": 0,
        "compressor": {"id": "gzip", "level": 5}, "filters": None,
    }
    p = tmp_path / "g.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr(".zarray", json.dumps(meta))
        zf.writestr("0.0", gzip.compress(arr.tobytes()))
    np.testing.assert_array_equal(read_zarr_zip(p), arr)


def test_read_real_zarr_if_available(tmp_path):
    zarr = pytest.importorskip("zarr")
    arr = np.arange(100, dtype=np.uint32).reshape(10, 10)
    p = tmp_path / "z.zip"
    write_zarr_zip(p, arr)
    z = zarr.open(str(p), mode="r")
    np.testing.assert_array_equal(np.asarray(z), arr)


def test_pinst_pp_zip_artifact_wsi(tmp_path):
    """run_hovernext_wsi writes the reference-contract zarr zip next to the
    internal npz, and load_instance_map reads both identically."""
    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.io.slide import ArraySlide
    from path_gene_multimodal_tpu.pipeline.nuclei_wsi import (
        load_instance_map,
        run_hovernext_wsi,
    )
    from test_fusion_wsi import StripeFakeModel

    img = np.full((300, 400, 3), 30, np.uint8)
    img[100:110, 100:110] = [255, 0, 0]
    map_path, nuclei = run_hovernext_wsi(
        ArraySlide(img), tmp_path, "z", StripeFakeModel(), default_config(),
        batch_size=4,
    )
    assert len(nuclei) == 1
    zip_path = tmp_path / "z_pinst_pp.zip"
    assert zip_path.exists()
    dense_npz = load_instance_map(map_path)
    dense_zip = load_instance_map(zip_path)
    assert dense_zip.shape == (300, 400) and dense_zip.dtype == np.uint32
    np.testing.assert_array_equal(dense_zip, dense_npz)
    # raw-zarr read path: squeeze (1, H, W) like the reference consumer
    raw = read_zarr_zip(zip_path)
    assert raw.shape == (1, 300, 400)


def test_per_tile_pinst_pp_zip(tmp_path):
    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.pipeline.nuclei import _tile_rows

    inst = np.zeros((64, 64), np.int32)
    inst[10:20, 10:20] = 1
    types = np.where(inst > 0, 2, 0).astype(np.int32)
    rows = _tile_rows(inst, types, 448, 224, tmp_path, "s", 16, True,
                      default_config())
    assert len(rows) == 1
    tdir = tmp_path / "hovernet_tiles" / "448_224"
    assert (tdir / "class_inst.json").exists()
    arr = read_zarr_zip(tdir / "pinst_pp.zip")
    assert arr.shape == (1, 64, 64)
    np.testing.assert_array_equal(arr[0], inst.astype(np.uint32))


def test_features_pt_sidecar(tmp_path):
    torch = pytest.importorskip("torch")
    from path_gene_multimodal_tpu.config import default_config
    from path_gene_multimodal_tpu.io.slide import synthetic_wsi
    from path_gene_multimodal_tpu.models.clip import ImageEncoder, VisionConfig
    from path_gene_multimodal_tpu.pipeline.embed import run_extract_features

    import jax.numpy as jnp

    slide = synthetic_wsi(700, 600, seed=2, n_blobs=2, nuclei_per_blob=5)
    vcfg = VisionConfig(image_size=224, patch_size=32, width=32, layers=1,
                        heads=2, out_dim=16)
    enc = ImageEncoder(vcfg, dtype=jnp.float32, seed=0)
    coords = np.array([[0, 0], [224, 0], [0, 224]], np.int64)
    feats = run_extract_features(
        slide, coords, enc, tmp_path, "pt", default_config(), write_artifacts=True
    )
    pt = tmp_path / "pt_features.pt"
    assert pt.exists()
    loaded = torch.load(pt, weights_only=True)
    np.testing.assert_allclose(loaded.numpy(), feats, rtol=1e-6)
