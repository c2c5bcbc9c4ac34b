"""Mesh sharding, halo exchange, DP training step, and the driver entry
points — on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from path_gene_multimodal_tpu.parallel.halo import sharded_stencil
from path_gene_multimodal_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    shard_batch,
    shard_params,
)
from path_gene_multimodal_tpu.parallel.train import (
    make_linear_probe_step,
    shard_step_over_mesh,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8  # conftest contract


def test_make_mesh():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("tiles",)
    with pytest.raises(ValueError, match="requested"):
        make_mesh(99)


def test_sharded_matches_single_device(rng):
    """A sharded forward must be numerically identical to unsharded."""
    from path_gene_multimodal_tpu.models.clip import VisionConfig, VisionTower, preprocess_tiles

    vcfg = VisionConfig(image_size=32, patch_size=16, width=32, layers=1, heads=2, out_dim=16)
    tower = VisionTower(vcfg, dtype=jnp.float32)
    tiles = jnp.asarray(rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8))
    params = tower.init(jax.random.PRNGKey(0), preprocess_tiles(tiles))

    single = tower.apply(params, preprocess_tiles(tiles))

    mesh = make_mesh(8)
    p_sh = shard_params(params, mesh)
    t_sh = jax.device_put(tiles, batch_sharding(mesh, 4))
    fwd = jax.jit(lambda p, t: tower.apply(p, preprocess_tiles(t)))
    sharded = fwd(p_sh, t_sh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)
    # output really is sharded over the mesh
    assert len(sharded.sharding.device_set) == 8


def test_molecular_ensemble_sharded_matches_single(rng):
    """IDaRSEnsemble under the tile-axis mesh == unsharded (the molecular
    stage's DP path, same pattern as ImageEncoder/NucleiModel)."""
    from path_gene_multimodal_tpu.models.resnet import IDaRSEnsemble, ResNetConfig

    cfg = ResNetConfig(stage_sizes=(1, 1, 1, 1), width=8)
    tiles = rng.integers(0, 256, (16, 64, 64, 3), dtype=np.uint8)
    single = IDaRSEnsemble(["msi", "hm"], cfg=cfg, dtype=jnp.float32, seed=3)
    ref = np.asarray(single(tiles))

    mesh = make_mesh(8)
    sharded = IDaRSEnsemble(["msi", "hm"], cfg=cfg, dtype=jnp.float32, seed=3,
                            mesh=mesh)
    out = sharded(tiles)
    assert len(out.sharding.device_set) == 8  # really ran over the mesh
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_pad_to_multiple():
    arr = np.ones((13, 4))
    padded, n = pad_to_multiple(arr, 8)
    assert padded.shape == (16, 4) and n == 13
    assert (padded[13:] == 0).all()


def test_halo_stencil_matches_dense(rng):
    mesh = make_mesh(8)
    field = rng.normal(size=(32, 16)).astype(np.float32)

    def dense_3row_mean(x):
        xp = np.pad(x, ((1, 1), (0, 0)), mode="edge")
        return (xp[:-2] + xp[1:-1] + xp[2:]) / 3.0

    smooth = sharded_stencil(
        lambda x: (x + jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)) / 3.0, mesh, halo=1
    )
    out = np.asarray(smooth(jnp.asarray(field)))
    np.testing.assert_allclose(out, dense_3row_mean(field), atol=1e-6)


def test_linear_probe_training_step_sharded(rng):
    from path_gene_multimodal_tpu.models.clip import VisionConfig, VisionTower, preprocess_tiles

    vcfg = VisionConfig(image_size=32, patch_size=16, width=32, layers=1, heads=2, out_dim=16)
    tower = VisionTower(vcfg, dtype=jnp.float32)
    tiles = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    pixels = np.asarray(preprocess_tiles(jnp.asarray(tiles)))
    labels = rng.integers(0, 5, 16).astype(np.int32)
    params = tower.init(jax.random.PRNGKey(0), jnp.asarray(pixels))

    init_state, step = make_linear_probe_step(
        lambda p, px: tower.apply(p, px), params, feature_dim=16, num_classes=5,
    )
    mesh = make_mesh(8)
    run, state = shard_step_over_mesh(step, mesh, init_state(jax.random.PRNGKey(1)))
    losses = []
    for _ in range(5):
        state, loss = run(state, pixels, labels)
        losses.append(float(loss))
    assert losses[-1] < losses[0]  # actually learns

    # sharded loss == single-device loss on the same data/params
    state1 = init_state(jax.random.PRNGKey(1))
    _, loss1 = step(state1, jnp.asarray(pixels), jnp.asarray(labels))
    state2 = init_state(jax.random.PRNGKey(1))
    run2, state2 = shard_step_over_mesh(step, mesh, state2)
    _, loss2 = run2(state2, pixels, labels)
    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)


def test_fusion_trainer_sharded_matches_single(rng):
    """Multimodal fusion (the repo's namesake head) trains data-parallel
    over the slide axis through the SAME shard_step_over_mesh helper —
    loss trajectory identical to the single-device run (replicated rng →
    identical dropout masks)."""
    from path_gene_multimodal_tpu.models.fusion import FusionHead, make_fusion_trainer

    model = FusionHead(num_outputs=2, proj_dim=8, hidden=8, dropout=0.1)
    hist = rng.normal(size=(16, 12)).astype(np.float32)
    genes = rng.normal(size=(16, 6)).astype(np.float32)
    labels = rng.integers(0, 2, 16).astype(np.int32)

    state, step, _ = make_fusion_trainer(model, 12, 6, 1e-2, seed=3)
    single_losses = []
    s1 = state
    for _ in range(4):
        s1, loss = step(s1, jnp.asarray(hist), jnp.asarray(genes), jnp.asarray(labels))
        single_losses.append(float(loss))

    mesh = make_mesh(8)
    state2, step2, _ = make_fusion_trainer(model, 12, 6, 1e-2, seed=3)
    run, s2 = shard_step_over_mesh(step2, mesh, state2)
    sharded_losses = []
    for _ in range(4):
        s2, loss = run(s2, hist, genes, labels)
        sharded_losses.append(float(loss))

    np.testing.assert_allclose(sharded_losses, single_losses, rtol=1e-5)
    assert sharded_losses[-1] < sharded_losses[0]


def test_graft_entry_and_dryrun():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    mod.dryrun_multichip(4)  # non-full mesh also works


def test_dryrun_multichip_under_driver_conditions():
    """Round-1 regression (MULTICHIP_r01.json rc=1): the driver invokes
    ``dryrun_multichip`` via ``python -c`` in the AMBIENT environment — no
    conftest, no virtual-device XLA flag, ``JAX_PLATFORMS`` as the image
    ships it. The entry point must self-provision the 8-device virtual CPU
    mesh. This test reproduces those exact conditions in a clean
    subprocess."""
    import os
    import re
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    # undo conftest's in-process provisioning: restore ambient-like env
    env["JAX_PLATFORMS"] = "axon"  # the image's ambient value
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    env.pop("_PGM_DRYRUN_REEXEC", None)
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=570,
    )
    assert res.returncode == 0, f"stderr:\n{res.stderr[-3000:]}"
    assert "dryrun_multichip OK on 8 devices" in res.stdout + res.stderr


def test_dryrun_multichip_after_backend_init():
    """If a backend is already initialised with too few devices (XLA flags
    are parsed once per process), the entry point must re-exec itself in a
    clean subprocess rather than fail."""
    import os
    import re
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    env.pop("_PGM_DRYRUN_REEXEC", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], cwd=repo, env=env,
        capture_output=True, text=True, timeout=570,
    )
    assert res.returncode == 0, f"stderr:\n{res.stderr[-3000:]}"


_DIST_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from path_gene_multimodal_tpu.parallel.mesh import init_distributed
init_distributed(f"localhost:{{port}}", num_processes=n, process_id=pid)
import jax.numpy as jnp
assert jax.process_count() == n
assert jax.device_count() == n  # one CPU device per process
from jax.experimental import multihost_utils
val = multihost_utils.process_allgather(jnp.asarray([pid], jnp.int32))
assert sorted(val.ravel().tolist()) == list(range(n)), val
jax.distributed.shutdown()
print(f"proc {{pid}}: OK", flush=True)
"""


def test_init_distributed_two_process():
    """VERDICT item 10: ``init_distributed`` (the multi-host DCN bring-up,
    parallel/mesh.py) exercised for real — two CPU processes join one
    ``jax.distributed`` cluster and run a cross-process allgather."""
    import os
    import re
    import socket
    import subprocess
    import sys
    import tempfile
    from pathlib import Path

    repo = str(Path(__file__).resolve().parents[1])
    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = Path(tempfile.mkdtemp()) / "dist_worker.py"
    worker.write_text(_DIST_WORKER.format(repo=repo))
    env = dict(os.environ)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} rc={p.returncode}:\n{out[-2000:]}"
        assert f"proc {i}: OK" in out


def test_image_encoder_mesh_matches_single(rng):
    from path_gene_multimodal_tpu.models.clip import ImageEncoder, VisionConfig

    vcfg = VisionConfig(image_size=32, patch_size=16, width=32, layers=1, heads=2, out_dim=16)
    single = ImageEncoder(vcfg, dtype=jnp.float32, seed=4)
    mesh = make_mesh(8)
    sharded = ImageEncoder(vcfg, params=single.params, dtype=jnp.float32, mesh=mesh)
    tiles = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    a = np.asarray(single(tiles))
    b = np.asarray(sharded(tiles))
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert len(sharded.params["params"]["proj"]["kernel"].sharding.device_set) == 8
