"""Training tests: mask generator stats, dataset shapes, 3-step smoke
train with checkpoint save + resume + export (tiny models, CPU)."""

import os

import numpy as np
import pytest
from PIL import Image

from diffusiontexturepainting_tpu.training.dataset import AugmentedTextures
from diffusiontexturepainting_tpu.training.mask_generator import (
    RandomMaskGenerator,
    simulate_draw_down_inpainting_mask,
)


# compile-heavy: full-size models / whole-pipeline jit on CPU
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def texture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("textures")
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((200, 220, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"tex_{i}.png")
    return str(d)


def test_simulate_mask_shapes_and_topheavy():
    m = simulate_draw_down_inpainting_mask(64, (1, 4))
    assert m.shape == (64, 64, 1)
    assert set(np.unique(m)).issubset({0.0, 1.0})
    # stamps enter from the top: averaged over trials the top half must be
    # fuller than the bottom half
    tops, bottoms = [], []
    for _ in range(30):
        m = simulate_draw_down_inpainting_mask(64, (1, 4))
        tops.append(m[:32].mean())
        bottoms.append(m[32:].mean())
    assert np.mean(tops) > np.mean(bottoms)


def test_random_mask_generator_probabilities():
    gen = RandomMaskGenerator(64, prob_empty=1.0, prob_no_mask=0.0, seed=0)
    assert gen().sum() == 0.0
    gen = RandomMaskGenerator(64, prob_no_mask=1.0, seed=0)
    assert gen().mean() == 1.0
    gen = RandomMaskGenerator(64, prob_empty=0.0, prob_no_mask=0.0, seed=1)
    masks = [gen() for _ in range(10)]
    assert all(m.shape == (64, 64, 1) for m in masks)
    # deterministic under seed
    gen2 = RandomMaskGenerator(64, prob_empty=0.0, prob_no_mask=0.0, seed=1)
    np.testing.assert_array_equal(masks[0], gen2())


def test_dataset_sample_shapes(texture_dir):
    ds = AugmentedTextures(texture_dir, size=64, cond_size=32,
                           num_patches=(1, 4, 9), seed=0)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0
    assert s["mask"].shape == (64, 64, 1)
    assert s["masked_image"].shape == (64, 64, 3)
    assert s["cond_patches"].shape == (14, 32, 32, 3)
    # masked image zeroed exactly where mask says generate
    gen_area = s["mask"][..., 0] > 0.5
    np.testing.assert_allclose(s["masked_image"][gen_area], 0.0, atol=1e-6)


def test_dataset_batches(texture_dir):
    ds = AugmentedTextures(texture_dir, size=64, cond_size=32, seed=0)
    batches = list(ds.batches(batch_size=2, steps=2))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert batches[0]["drop_cond"].shape == (2,)


def test_dataset_resume_replays_exact_sequence(texture_dir):
    """start=N must reproduce the original run's batches N.. exactly —
    the rebuild of the reference's resume dataloader step skipping
    (train_texture_inpaint_lora.py:610-632, 643-646), as an O(1)
    fast-forward. Covers an epoch boundary (3 images / batch 2 ->
    1 batch per epoch)."""
    ds = AugmentedTextures(texture_dir, size=64, cond_size=32, seed=7)
    full = list(ds.batches(batch_size=2, steps=5))

    ds2 = AugmentedTextures(texture_dir, size=64, cond_size=32, seed=7)
    resumed = list(ds2.batches(batch_size=2, steps=2, start=3))
    for a, b in zip(full[3:], resumed):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    # different seed -> different stream
    ds3 = AugmentedTextures(texture_dir, size=64, cond_size=32, seed=8)
    other = next(ds3.batches(batch_size=2, steps=1, start=3))
    assert any(not np.array_equal(other[k], full[3][k]) for k in other)


def test_smoke_train_checkpoint_resume_export(texture_dir, tmp_path):
    from diffusiontexturepainting_tpu.training.train import main

    out = str(tmp_path / "run1")
    export = main([
        "--images_path", texture_dir, "--output_dir", out,
        "--resolution", "64", "--train_batch_size", "2",
        "--max_train_steps", "3", "--checkpointing_steps", "2",
        "--tiny", "--log_every", "1", "--seed", "0",
        "--mesh_data", "1",
    ])
    assert os.path.exists(os.path.join(export, "unet.npz"))
    assert os.path.exists(os.path.join(export, "patch_encoder.npz"))
    ckpts = os.listdir(os.path.join(out, "checkpoints"))
    assert any("2" in c for c in ckpts)

    # resume from latest and run one more step
    main([
        "--images_path", texture_dir, "--output_dir", out,
        "--resolution", "64", "--train_batch_size", "2",
        "--max_train_steps", "4", "--checkpointing_steps", "100",
        "--tiny", "--log_every", "1", "--seed", "0",
        "--mesh_data", "1",
        "--resume_from_checkpoint", "latest",
    ])


def test_export_loads_into_serving(texture_dir, tmp_path):
    """The training export must be loadable by the serving loader."""
    from diffusiontexturepainting_tpu.training.train import main

    out = str(tmp_path / "run2")
    export = main([
        "--images_path", texture_dir, "--output_dir", out,
        "--resolution", "64", "--train_batch_size", "2",
        "--max_train_steps", "1", "--checkpointing_steps", "100",
        "--tiny", "--log_every", "1", "--mesh_data", "1",
    ])
    from diffusiontexturepainting_tpu.pipeline.tpu_model import (
        TPUConditionalInpainter)

    model = TPUConditionalInpainter(resolution=64, tiny=True, warmup=False,
                                    checkpoint_dir=export,
                                    verbose_timing=False)
    canvas = np.zeros((64, 64, 4), np.float32)
    canvas[:8, :, 3] = 1.0
    outp = model.generate(canvas, steps=2)
    assert outp.shape == (64, 64, 3)
