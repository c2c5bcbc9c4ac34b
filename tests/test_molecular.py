"""ResNet34 parity vs torchvision, IDaRS ensemble, prob-map splat golden,
molecular pipeline artifacts + batch loop."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from path_gene_multimodal_tpu.config import default_config
from path_gene_multimodal_tpu.io.slide import synthetic_wsi
from path_gene_multimodal_tpu.models.resnet import (
    IDaRSEnsemble,
    ResNet,
    ResNetConfig,
)
from path_gene_multimodal_tpu.models.weights_resnet import convert_resnet34
from path_gene_multimodal_tpu.ops.scatter import splat_prob_map
from path_gene_multimodal_tpu.pipeline.molecular import (
    extract_molecular_features,
    get_wsi_overview_and_dims,
    select_tme_tiles,
)

SMALL_RESNET = ResNetConfig(stage_sizes=(1, 1, 1, 1), num_classes=2, width=8)


def _torch_resnet34(torch, num_classes=2):
    """Minimal torch ResNet34 with torchvision-compatible parameter naming
    (the layout of TIAToolbox's resnet34-idars-* checkpoints)."""
    nn = torch.nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
                )

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class ResNet34(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            dims = [64, 128, 256, 512]
            blocks = [3, 4, 6, 3]
            cin = 64
            for i, (d, n) in enumerate(zip(dims, blocks)):
                layers = []
                for b in range(n):
                    stride = 2 if (i > 0 and b == 0) else 1
                    layers.append(BasicBlock(cin, d, stride))
                    cin = d
                setattr(self, f"layer{i+1}", nn.Sequential(*layers))
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i+1}")(x)
            x = x.mean(dim=(2, 3))
            return self.fc(x)

    return ResNet34()


def test_resnet34_parity_torch():
    torch = pytest.importorskip("torch")

    torch.manual_seed(0)
    tmodel = _torch_resnet34(torch).eval()
    # randomize BN running stats so folding is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    variables = convert_resnet34(tmodel.state_dict())
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(ResNet(dtype=jnp.float32).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_idars_ensemble_shapes():
    ens = IDaRSEnsemble(["msi", "hm", "cin"], cfg=SMALL_RESNET, dtype=jnp.float32)
    tiles = np.random.default_rng(0).integers(0, 256, (4, 224, 224, 3), dtype=np.uint8)
    probs = np.asarray(ens(jnp.asarray(tiles)))
    assert probs.shape == (3, 4)
    assert (probs >= 0).all() and (probs <= 1).all()


def test_ensemble_matches_individual():
    """Stacked/vmapped sweep == running each task's model separately."""
    cfg = SMALL_RESNET
    ens = IDaRSEnsemble(["a", "b"], cfg=cfg, dtype=jnp.float32, seed=3)
    tiles = np.random.default_rng(1).integers(0, 256, (2, 224, 224, 3), dtype=np.uint8)
    stacked_out = np.asarray(ens(jnp.asarray(tiles)))
    import jax

    for ti in range(2):
        single = jax.tree.map(lambda x: x[ti], ens.stacked)
        one = IDaRSEnsemble(["x"], params_per_task=[single], cfg=cfg, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(one(jnp.asarray(tiles)))[0], stacked_out[ti], atol=1e-5
        )


def test_splat_prob_map_golden():
    coords = np.array([[0, 0], [4, 0], [2, 2]], np.int32)  # overlapping boxes
    probs = np.array([[0.2, 0.6, 1.0]], np.float32)
    out = np.asarray(splat_prob_map(jnp.asarray(coords), jnp.asarray(probs), 8, 10, 4))
    # golden: python splat (reference make_prob_map_for_task loop)
    accum = np.zeros((8, 10)); count = np.zeros((8, 10))
    for (x, y), p in zip(coords, probs[0]):
        accum[y:y+4, x:x+4] += p
        count[y:y+4, x:x+4] += 1
    golden = np.clip(accum / np.maximum(count, 1), 0, 1)
    np.testing.assert_allclose(out[0], golden, atol=1e-6)


def test_splat_out_of_bounds_dropped():
    coords = np.array([[8, 6]], np.int32)  # footprint crosses the boundary
    probs = np.array([[1.0]], np.float32)
    out = np.asarray(splat_prob_map(jnp.asarray(coords), jnp.asarray(probs), 8, 10, 4))
    assert out[0, 7, 9] == 1.0
    assert out.shape == (1, 8, 10)


@pytest.fixture
def molecular_setup(tmp_path):
    cfg = default_config()
    classes = list(cfg.classes)
    slide = synthetic_wsi(1024, 768, seed=4, n_blobs=2, nuclei_per_blob=20)
    rows = []
    for i, (x, y) in enumerate([(0, 0), (224, 224), (448, 0)]):
        rows.append({"tile_index": i, "x": x, "y": y,
                     "predicted_class": classes[0], "in_tme_roi": True})
    csv = tmp_path / "m_annotations_with_coords.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return slide, csv, tmp_path, cfg


def test_molecular_pipeline(molecular_setup):
    slide, csv, tmp_path, cfg = molecular_setup
    ens = IDaRSEnsemble(["msi", "hm"], cfg=SMALL_RESNET, dtype=jnp.float32)
    res = extract_molecular_features(slide, csv, tmp_path, "m", ens, cfg, batch_size=2)
    assert "msi_prob" in res.features.columns and "hm_prob" in res.features.columns
    assert len(res.features) == 3
    assert (tmp_path / "m_molecular_features.csv").exists()
    assert (tmp_path / "m_msi_overlay.png").exists()
    assert (tmp_path / "m_hm_overlay.png").exists()
    assert (tmp_path / "m_molecular_grid.png").exists()
    assert res.prob_maps.shape[0] == 2
    # prob map nonzero where tiles landed
    assert res.prob_maps[0].max() > 0


def test_overview_power():
    slide = synthetic_wsi(800, 600, seed=5, n_blobs=1, nuclei_per_blob=5)
    thumb, ds = get_wsi_overview_and_dims(slide, power=4.0, base_power=40.0)
    assert ds == pytest.approx(10.0, rel=0.05)
    assert thumb.shape[1] == pytest.approx(80, abs=2)


def test_molecular_loop_cli(molecular_setup, monkeypatch, tmp_path):
    slide, csv, out_tmp, cfg = molecular_setup
    from path_gene_multimodal_tpu.cli import molecular_loop as ml

    data = tmp_path / "data"
    data.mkdir()
    slide.save(data / "caseA.npz")
    # loop scans for WSI_EXTS; .npz isn't one, so patch slide_paths
    monkeypatch.setattr(ml, "slide_paths", lambda p: [data / "caseA.npz"])
    outroot = tmp_path / "out"
    (outroot / "caseA").mkdir(parents=True)
    import shutil

    shutil.copy(csv, outroot / "caseA" / "caseA_annotations_with_coords.csv")
    # small ensemble
    import path_gene_multimodal_tpu.models.resnet as rn

    monkeypatch.setattr(
        ml, "main", ml.main,  # no-op, keep reference
    )
    orig_init = rn.IDaRSEnsemble.__init__
    monkeypatch.setattr(
        rn.IDaRSEnsemble, "__init__",
        lambda self, tasks, **kw: orig_init(self, tasks, cfg=SMALL_RESNET,
                                            dtype=jnp.float32, mesh=kw.get("mesh")),
    )
    # --dp: the loop builds the all-device tile-axis mesh and the ensemble
    # runs data-parallel over the 8 virtual devices (batch 64 divides 8)
    rc = ml.main(["--data-path", str(data), "--outroot", str(outroot),
                  "--tasks", "msi", "--dp"])
    assert rc == 0
    assert (outroot / "caseA" / "caseA_molecular_features.csv").exists()
    assert (outroot / "success_slides.txt").read_text().strip() == "caseA"
    # second run: skipped via done detection
    rc2 = ml.main(["--data-path", str(data), "--outroot", str(outroot), "--tasks", "msi"])
    assert rc2 == 0


def test_molecular_loop_cli_weights_dir(molecular_setup, monkeypatch, tmp_path):
    """--weights-dir: converted resnet34 artifacts (cli.convert_weights)
    drive the ensemble; the loaded params reach the model unchanged."""
    slide, csv, out_tmp, cfg = molecular_setup
    import jax

    from path_gene_multimodal_tpu.cli import molecular_loop as ml
    from path_gene_multimodal_tpu.core.checkpoints import save_converted
    import path_gene_multimodal_tpu.models.resnet as rn

    data = tmp_path / "data"
    data.mkdir()
    slide.save(data / "caseB.npz")
    monkeypatch.setattr(ml, "slide_paths", lambda p: [data / "caseB.npz"])
    outroot = tmp_path / "out"
    (outroot / "caseB").mkdir(parents=True)
    import shutil

    shutil.copy(csv, outroot / "caseB" / "caseB_annotations_with_coords.csv")

    # converted artifact for the msi task (small config to keep it fast)
    template = rn.ResNet(SMALL_RESNET)
    params = template.init(jax.random.PRNGKey(9), jnp.zeros((1, 224, 224, 3), jnp.float32))
    wdir = tmp_path / "weights"
    save_converted("resnet34", None, params, wdir / "msi")

    seen = {}
    orig_init = rn.IDaRSEnsemble.__init__

    def spy_init(self, tasks, params_per_task=None, **kw):
        seen["params"] = params_per_task
        orig_init(self, tasks, params_per_task, cfg=SMALL_RESNET, dtype=jnp.float32)

    monkeypatch.setattr(rn.IDaRSEnsemble, "__init__", spy_init)
    monkeypatch.setattr(rn, "RESNET34_IDARS", SMALL_RESNET)
    rc = ml.main(["--data-path", str(data), "--outroot", str(outroot),
                  "--tasks", "msi", "--weights-dir", str(wdir)])
    assert rc == 0
    assert (outroot / "caseB" / "caseB_molecular_features.csv").exists()
    # the artifact's params were handed to the ensemble bit-exactly
    assert seen["params"] is not None and len(seen["params"]) == 1
    got = seen["params"][0]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        got, jax.device_get(params),
    )
