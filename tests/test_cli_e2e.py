"""End-to-end CLI tests on a synthetic dataset (tiny preset, CPU):
train VAE -> train LDM on frozen latents -> sample images; plus the
pixel-space DDPM path and checkpoint interop."""
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(24, 20, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i}.jpg")
    # nested dir to exercise the recursive jpg glob (dataset.py:25)
    sub = d / "nested"
    sub.mkdir()
    arr = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(sub / "n.jpg")
    return str(d)


def test_full_ldm_workflow(dataset_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ldm_image_generator_tpu.cli import sample_ldm, train_ldm, train_vae

    common = [
        "-d", "cpu", "--config", "tiny", "-s", "16", "-b", "2", "-e", "1",
    ]
    paths = [
        "-ep", str(tmp_path / "enc.ckpt"), "-dp", str(tmp_path / "dec.ckpt"),
    ]
    train_vae.main(
        [dataset_dir] + common + paths
        + ["-qp", str(tmp_path / "q.ckpt"),
           "-discp", str(tmp_path / "disc.ckpt"),
           "-r", str(tmp_path / "results")]
    )
    assert os.path.exists(tmp_path / "enc.ckpt")
    assert os.path.exists(tmp_path / "results" / "0_reconstructed.jpg")

    train_ldm.main(
        [dataset_dir] + common
        + ["-ep", str(tmp_path / "enc.ckpt"),
           "-mp", str(tmp_path / "ddpm.ckpt"),
           "--ckpt-dir", str(tmp_path / "ckpts")]
    )
    assert os.path.exists(tmp_path / "ddpm.ckpt")
    assert len(os.listdir(tmp_path / "ckpts")) > 0  # orbax step dir

    sample_ldm.main(
        ["-d", "cpu", "--config", "tiny", "-s", "16", "-t", "3",
         "-dp", str(tmp_path / "ddpm.ckpt"),
         "-decp", str(tmp_path / "dec.ckpt"),
         "-n", "2", "-o", str(tmp_path / "out")]
    )
    files = sorted(os.listdir(tmp_path / "out"))
    assert files == ["0.jpg", "1.jpg"]


def test_conditional_ldm_workflow(dataset_dir, tmp_path, monkeypatch):
    """Class-conditional training (dir-per-class) + guided sampling:
    CLI e2e for the conditioning surface the reference stubs out
    (ddpm.py:78 hardcodes condition=None). Guided samples must be
    deterministic per seed and the CFG scale must change outputs."""
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    from ldm_image_generator_tpu.cli import sample_ldm, train_ldm

    # second class dir so there are >= 2 labels
    rng = np.random.RandomState(7)
    d2 = tmp_path / "class_b"
    d2.mkdir()
    for i in range(4):
        arr = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d2 / f"{i}.jpg")

    train_ldm.main(
        [dataset_dir, str(d2), "-d", "cpu", "--config", "tiny",
         "-s", "16", "-b", "2", "-e", "1",
         "--num-classes", "-1", "--cond-drop", "0.25",
         "-mp", str(tmp_path / "cond.ckpt")]
    )
    assert os.path.exists(tmp_path / "cond.ckpt")

    common = ["-d", "cpu", "--config", "tiny", "-s", "16", "-t", "3",
              "-n", "2", "--num-classes", "2",
              "-dp", str(tmp_path / "cond.ckpt")]
    sample_ldm.main(common + ["--class-id", "0", "--guidance-scale", "2.0",
                              "-o", str(tmp_path / "g0")])
    sample_ldm.main(common + ["--class-id", "0", "--guidance-scale", "2.0",
                              "-o", str(tmp_path / "g0_again")])
    sample_ldm.main(common + ["--class-id", "0", "--guidance-scale", "5.0",
                              "-o", str(tmp_path / "g0_strong")])
    sample_ldm.main(common + ["--class-id", "1", "--guidance-scale", "2.0",
                              "-o", str(tmp_path / "g1")])

    img = lambda d: np.asarray(
        __import__("PIL.Image", fromlist=["Image"]).open(
            tmp_path / d / "0.jpg"
        )
    )
    a, a2, strong, b = img("g0"), img("g0_again"), img("g0_strong"), img("g1")
    np.testing.assert_array_equal(a, a2)  # deterministic per seed
    assert np.any(a != strong)  # CFG scale changes outputs
    assert np.any(a != b)       # class id changes outputs


def test_img2img_inpaint_cli(dataset_dir, tmp_path, monkeypatch):
    """sample_ldm --init-image/--strength/--mask e2e (capability the
    reference lacks: its sampler always starts from pure noise,
    ddpm.py:62). Missing checkpoint paths fall back to seed-derived init
    params, so same seed => same model => deterministic outputs."""
    from PIL import Image

    monkeypatch.chdir(tmp_path)
    from ldm_image_generator_tpu.cli import sample_ldm

    rng = np.random.RandomState(3)
    init = tmp_path / "init.jpg"
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(init)
    mask = tmp_path / "mask.png"  # right half regenerated
    m = np.zeros((16, 16), np.uint8)
    m[:, 8:] = 255
    Image.fromarray(m).save(mask)

    common = ["-d", "cpu", "--config", "tiny", "-s", "16", "-t", "4",
              "-n", "1", "--init-image", str(init)]
    sample_ldm.main(common + ["--strength", "0.5",
                              "-o", str(tmp_path / "a")])
    sample_ldm.main(common + ["--strength", "0.5",
                              "-o", str(tmp_path / "a2")])
    sample_ldm.main(common + ["--strength", "0.9",
                              "-o", str(tmp_path / "b")])
    sample_ldm.main(common + ["--strength", "0.5", "--mask", str(mask),
                              "-o", str(tmp_path / "m")])

    img = lambda d: np.asarray(Image.open(tmp_path / d / "0.jpg"))
    a, a2, b, masked = img("a"), img("a2"), img("b"), img("m")
    np.testing.assert_array_equal(a, a2)  # deterministic per seed
    assert np.any(a != b)       # strength changes the sub-schedule
    assert np.any(a != masked)  # mask projection changes outputs

    with pytest.raises(SystemExit, match="--mask requires"):
        sample_ldm.main(["-d", "cpu", "--config", "tiny", "-s", "16",
                         "--mask", str(mask)])


def test_ddpm_pixel_workflow(dataset_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ldm_image_generator_tpu.cli import sample_ddpm, train_ddpm

    train_ddpm.main(
        [dataset_dir, "-d", "cpu", "--config", "tiny", "-s", "8",
         "-b", "2", "-e", "1", "-m", "4",
         "-mp", str(tmp_path / "pix.ckpt")]
    )
    assert os.path.exists(tmp_path / "pix.ckpt")

    sample_ddpm.main(
        ["-d", "cpu", "--config", "tiny", "-s", "8", "-t", "2", "-n", "2",
         "-dp", str(tmp_path / "pix.ckpt"), "-o", str(tmp_path / "pix_out")]
    )
    assert sorted(os.listdir(tmp_path / "pix_out")) == ["0.jpg", "1.jpg"]


def test_validation_logging(dataset_dir, tmp_path, monkeypatch, capsys):
    """--val-dir/--val-every must surface train/eval.py from the CLI:
    a val_loss (and val_loss_ema with --ema) JSONL line appears."""
    import json

    monkeypatch.chdir(tmp_path)
    from ldm_image_generator_tpu.cli import train_ddpm

    train_ddpm.main(
        [dataset_dir, "-d", "cpu", "--config", "tiny", "-s", "8",
         "-b", "2", "-e", "1", "-m", "4", "--ema", "0.99",
         "-mp", str(tmp_path / "val.ckpt"),
         "--val-dir", dataset_dir, "--val-every", "1",
         "--val-batches", "2"]
    )
    val_lines = [
        json.loads(ln) for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{") and "val_loss" in ln
    ]
    assert val_lines, "no val_loss JSONL line was emitted"
    for rec in val_lines:
        assert np.isfinite(rec["val_loss"])
        assert np.isfinite(rec["val_loss_ema"])


def test_torch_checkpoint_loads_via_cli_path(tmp_path):
    """A reference torch state_dict dropped at the checkpoint path must be
    transparently converted (migration path for reference users)."""
    import torch

    from tests.reference_util import import_reference

    vae_ref = import_reference("vae")
    ref = vae_ref.VectorQuantizer(num_embeddings=16, dim=8)
    p = tmp_path / "q.pt"
    torch.save(ref.state_dict(), str(p))

    from ldm_image_generator_tpu.cli.common import maybe_load
    from ldm_image_generator_tpu.utils import torch_import as ti

    loaded = maybe_load(str(p), None, ti.convert_quantizer)
    np.testing.assert_allclose(
        loaded["params"]["embeddings"],
        ref.state_dict()["embeddings"].numpy(),
    )


def test_convert_tool(tmp_path):
    import torch

    from tests.reference_util import import_reference

    vae_ref = import_reference("vae")
    torch.manual_seed(1)
    ref = vae_ref.Encoder(channels=[8, 16], stages=[1, 2])
    p = tmp_path / "enc.pt"
    torch.save(ref.state_dict(), str(p))

    from ldm_image_generator_tpu.cli import convert

    out = tmp_path / "enc.ckpt"
    # tiny config matches channels (8,16)? no — use explicit conversion
    # shape check only: the tool must produce a loadable msgpack file
    import pytest
    with pytest.raises(KeyError):
        # default config expects the full-size encoder layout
        convert.main([str(p), "--kind", "encoder", "-o", str(out)])


def test_convert_tool_roundtrip_quantizer(tmp_path):
    import torch

    from tests.reference_util import import_reference

    vae_ref = import_reference("vae")
    ref = vae_ref.VectorQuantizer()  # default 8192x8 matches default config
    p = tmp_path / "q.pt"
    torch.save(ref.state_dict(), str(p))

    from ldm_image_generator_tpu.cli import convert

    out = tmp_path / "q.ckpt"
    convert.main([str(p), "--kind", "quantizer", "-o", str(out)])
    assert out.exists()

    from flax import serialization

    tree = serialization.from_bytes(None, out.read_bytes())
    import numpy as np
    np.testing.assert_allclose(
        tree["params"]["embeddings"],
        ref.state_dict()["embeddings"].numpy(),
    )


def test_train_resume_continues_from_step(dataset_dir, tmp_path, monkeypatch):
    """orbax full-state resume: a second invocation picks up the step
    counter instead of restarting (the reference can only reload weights,
    never optimizer state, SURVEY.md §5)."""
    monkeypatch.chdir(tmp_path)
    from ldm_image_generator_tpu.cli import train_ldm

    args = [dataset_dir, "-d", "cpu", "--config", "tiny", "-s", "16",
            "-b", "2", "-e", "1",
            "-mp", str(tmp_path / "m.ckpt"),
            "--ckpt-dir", str(tmp_path / "ck")]
    train_ldm.main(args)
    steps1 = {int(d) for d in os.listdir(tmp_path / "ck") if d.isdigit()}
    assert steps1, os.listdir(tmp_path / "ck")
    train_ldm.main(args)  # resume
    steps2 = {int(d) for d in os.listdir(tmp_path / "ck") if d.isdigit()}
    assert max(steps2) > max(steps1), (steps1, steps2)


def test_fused_steps_matches_unfused(dataset_dir, tmp_path, monkeypatch):
    """--fused-steps N (N train steps per dispatch as one donated scan)
    must produce the same trained weights as N single-step dispatches up
    to float rounding — the per-step fold_in keys and step math are
    identical; XLA fuses the scanned body in a different order, so
    outputs agree to ~1e-6 relative, not bitwise."""
    import jax
    from flax import serialization

    def load_tree(path):
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())

    def run(outdir, fused):
        monkeypatch.chdir(tmp_path)
        os.makedirs(outdir, exist_ok=True)
        monkeypatch.chdir(outdir)
        train_ldm.main([
            str(dataset_dir), "-d", "cpu", "--config", "tiny", "-e", "1",
            "-b", "2", "-m", "4", "-s", "16", "--save-every", "1000",
            "--fused-steps", str(fused),
        ])
        return os.path.join(str(outdir), "ddpm.pt")

    from ldm_image_generator_tpu.cli import train_ldm

    p1 = run(tmp_path / "unfused", 1)
    p2 = run(tmp_path / "fused", 2)
    # fused-steps larger than the whole epoch (2 batches): every batch
    # must flush through the unfused step at epoch end instead of being
    # silently dropped (advisor r3) — same keys/steps as the unfused run
    p3 = run(tmp_path / "fused3", 3)

    t1 = load_tree(p1)
    t2 = load_tree(p2)
    t3 = load_tree(p3)
    assert jax.tree.structure(t1) == jax.tree.structure(t2)
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        # atol matters: near-zero bias entries make rtol meaningless
        # (AdamW's eps-normalized updates differ by ~1e-6 under the
        # scanned body's different fusion order)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
    # the flush path runs the SAME unfused step_fn with the same fold_in
    # keys, so it matches the unfused run exactly
    for a, b in zip(jax.tree.leaves(t1), jax.tree.leaves(t3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
