"""Op-level parity tests: dilation vs numpy oracle, resize vs torch."""

import jax.numpy as jnp
import numpy as np
import pytest

from diffusiontexturepainting_tpu.ops.morphology import add_extra_context, dilate_square
from diffusiontexturepainting_tpu.ops.resize import nearest_downsample, resize2d


def _np_dilate(mask, pad):
    """Oracle: brute-force square dilation with window [-(p-1)//2, p//2]."""
    h, w = mask.shape
    left, right = (pad - 1) // 2, pad // 2
    out = np.zeros_like(mask)
    for y in range(h):
        for x in range(w):
            y0, y1 = max(0, y - left), min(h, y + right + 1)
            x0, x1 = max(0, x - left), min(w, x + right + 1)
            out[y, x] = mask[y0:y1, x0:x1].max()
    return out


@pytest.mark.parametrize("pad", [1, 2, 3, 8, 15])
def test_dilate_square_matches_bruteforce(pad):
    rng = np.random.default_rng(0)
    mask = (rng.random((24, 20)) > 0.92).astype(np.float32)
    ours = np.asarray(dilate_square(jnp.asarray(mask[None, ..., None]), pad))[0, ..., 0]
    np.testing.assert_array_equal(ours, _np_dilate(mask, pad))


def test_dilate_dynamic_pad_no_recompile():
    """pad is a traced scalar: one jitted program serves every pad."""
    import jax

    traces = []

    @jax.jit
    def f(m, pad):
        traces.append(1)
        return dilate_square(m, pad)

    m = jnp.zeros((1, 16, 16, 1)).at[0, 8, 8, 0].set(1.0)
    a = np.asarray(f(m, 3))
    b = np.asarray(f(m, 7))
    assert len(traces) == 1
    assert a.sum() == 9 and b.sum() == 49


def test_add_extra_context_semantics():
    """Hint image appears only outside the dilated painted area; context
    mask covers both painted area and hint area."""
    mask = np.zeros((1, 16, 16, 1), np.float32)
    mask[0, 0:4, 0:4] = 1.0
    src = np.full((1, 16, 16, 3), 0.5, np.float32)
    masked = np.zeros((1, 16, 16, 3), np.float32)
    cmi, cm = add_extra_context(jnp.asarray(src), jnp.asarray(masked),
                                jnp.asarray(mask), pad=5)
    cmi, cm = np.asarray(cmi), np.asarray(cm)
    # far corner: hint pasted
    assert cmi[0, 15, 15, 0] == 0.5 and cm[0, 15, 15, 0] == 1.0
    # painted corner: masked image kept (0 here), mask known
    assert cmi[0, 0, 0, 0] == 0.0 and cm[0, 0, 0, 0] == 1.0
    # dilation ring around painted area: neither painted nor hint
    assert cmi[0, 5, 5, 0] == 0.0 and cm[0, 5, 5, 0] == 0.0


@pytest.mark.parametrize("mode,align", [("bilinear", False), ("bilinear", True),
                                        ("bicubic", True), ("bicubic", False),
                                        ("nearest", False)])
@pytest.mark.parametrize("sizes", [(17, 32), (64, 33), (224, 74), (32, 32)])
def test_resize_matches_torch(mode, align, sizes):
    import torch
    import torch.nn.functional as F

    in_s, out_s = sizes
    rng = np.random.default_rng(1)
    img = rng.random((2, in_s, in_s, 3)).astype(np.float32)
    ours = np.asarray(resize2d(jnp.asarray(img), out_s, out_s, mode=mode,
                               align_corners=align))
    t = torch.from_numpy(img).permute(0, 3, 1, 2)
    kwargs = {} if mode == "nearest" else {"align_corners": align}
    ref = F.interpolate(t, size=(out_s, out_s), mode=mode, **kwargs)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_nearest_downsample_matches_interpolate():
    import torch
    import torch.nn.functional as F

    img = np.random.default_rng(2).random((1, 64, 64, 1)).astype(np.float32)
    ours = np.asarray(nearest_downsample(jnp.asarray(img), 8))
    ref = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=(8, 8))
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy())


def test_transformer_block_2d_layout_matches_3d():
    """_T2D_2D (pointwise ops on (B*L, C)) must be numerically identical
    to the 3D baseline - it only changes tensor shapes, not math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusiontexturepainting_tpu.models import layers

    blk = layers.BasicTransformerBlock(num_heads=2, head_dim=8, kv_dim=12)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 10, 16), jnp.float32)
    ctx = jax.random.normal(key, (3, 5, 12), jnp.float32)
    prev = layers._T2D_2D
    try:
        layers._T2D_2D = False
        params = blk.init(key, x, ctx)["params"]
        out3 = blk.apply({"params": params}, x, ctx)
        layers._T2D_2D = True
        # same param tree must serve both layouts
        out2 = blk.apply({"params": params}, x, ctx)
    finally:
        layers._T2D_2D = prev
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out3),
                               atol=1e-5, rtol=1e-5)


def test_gn_conv_resident_matches_reference():
    """Resident chained-GN conv kernel (interpret mode) vs the XLA
    reference, with residual and stats epilogue."""
    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.ops.conv3x3 import (
        gn_conv_resident,
        gn_conv_resident_plan,
    )

    rng = np.random.default_rng(0)
    B, H, W, Cin, Cout = 2, 16, 16, 128, 128
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)), jnp.float32)
    a = jnp.asarray(rng.standard_normal((B, Cin)) * 0.2 + 1, jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, Cin)) * 0.2, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.05,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((B, H, W, Cout)), jnp.float32)
    assert gn_conv_resident_plan(x.shape, w.shape, True) is not None
    ro, rs = gn_conv_resident(x, a, c, w, b, r, True, True, force="xla")
    po, ps = gn_conv_resident(x, a, c, w, b, r, True, True, force="pallas")
    np.testing.assert_allclose(np.asarray(po), np.asarray(ro),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ps[:, :2]), np.asarray(rs[:, :2]),
                               atol=1e-2, rtol=1e-3)


def test_resnet_block_fused_matches_module():
    """ResnetBlock(fused=True) must match the module path with the SAME
    param tree (serving flag flips execution, not parameters)."""
    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.models.layers import ResnetBlock

    key = jax.random.PRNGKey(0)
    for in_ch, out_ch, temb_on in [(128, 128, True), (64, 128, True),
                                   (128, 128, False)]:
        x = jax.random.normal(key, (2, 8, 8, in_ch), jnp.float32)
        temb = (jax.random.normal(key, (2, 24), jnp.float32)
                if temb_on else None)
        mod = ResnetBlock(out_ch, num_groups=8, use_temb=temb_on)
        fus = ResnetBlock(out_ch, num_groups=8, use_temb=temb_on,
                          fused=True)
        p = mod.init(key, x, temb)["params"]
        pf = fus.init(key, x, temb)["params"]
        assert (jax.tree_util.tree_structure(p)
                == jax.tree_util.tree_structure(pf))
        av = mod.apply({"params": p}, x, temb)
        bv = fus.apply({"params": p}, x, temb)
        np.testing.assert_allclose(np.asarray(av), np.asarray(bv),
                                   atol=2e-5, rtol=1e-4)


def test_ff_geglu_kernel_flavors():
    """Fused FF kernel vs the exact-gelu reference: the A-S erf flavor is
    f32-exact; the default tanh flavor is within bf16 rounding (2e-3)."""
    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.ops import ff_geglu as ffm

    rng = np.random.default_rng(0)
    N, C = 256, 128
    inner = 4 * C
    mk = lambda s, sc: jnp.asarray(rng.standard_normal(s) * sc, jnp.float32)
    x, w0, b0 = mk((N, C), 0.5), mk((C, 2 * inner), 0.05), mk((2 * inner,), 0.1)
    w2, b2, res = mk((inner, C), 0.05), mk((C,), 0.1), mk((N, C), 1.0)
    ref = ffm.ff_geglu(x, w0, b0, w2, b2, res, force="xla")
    prev = ffm._FF_GELU_FLAVOR
    try:
        ffm._FF_GELU_FLAVOR = "erf"
        exact = ffm.ff_geglu(x, w0, b0, w2, b2, res, force="pallas")
        np.testing.assert_allclose(np.asarray(exact), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)
        ffm._FF_GELU_FLAVOR = "tanh"
        fast = ffm.ff_geglu(x, w0, b0, w2, b2, res, force="pallas")
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=2e-3, rtol=2e-3)
    finally:
        ffm._FF_GELU_FLAVOR = prev


def test_transformer_block_fused_ff_matches_module():
    """BasicTransformerBlock(ff_fused=True): same param tree, output
    within the tanh-gelu tolerance of the module path."""
    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.models.layers import (
        BasicTransformerBlock,
    )

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 64, 128), jnp.float32)
    ctx = jax.random.normal(key, (2, 5, 96), jnp.float32)
    a = BasicTransformerBlock(4, 32, kv_dim=96)
    b = BasicTransformerBlock(4, 32, kv_dim=96, ff_fused=True)
    p = a.init(key, x, ctx)["params"]
    pf = b.init(key, x, ctx)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    ya = a.apply({"params": p}, x, ctx)
    yb = b.apply({"params": p}, x, ctx)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               atol=2e-3, rtol=2e-3)


def test_transformer2d_gn_folded_matches_module():
    """Transformer2D(gn_folded=True): identical param tree; the folded
    (x*a)@W + c@W algebra must match GN -> proj_in, both with self-computed
    stats and with chained-in stats."""
    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.models.layers import Transformer2D
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import stats_of

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 128), jnp.float32)
    ctx = jax.random.normal(key, (2, 5, 96), jnp.float32)
    a = Transformer2D(4, 32, kv_dim=96, num_groups=8)
    b = Transformer2D(4, 32, kv_dim=96, num_groups=8, gn_folded=True)
    p = a.init(key, x, ctx)["params"]
    pf = b.init(key, x, ctx)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    ya = a.apply({"params": p}, x, ctx)
    yb = b.apply({"params": p}, x, ctx)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               atol=1e-4, rtol=1e-4)
    yc = b.apply({"params": p}, x, ctx, in_stats=stats_of(x))
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yb),
                               atol=1e-5, rtol=1e-5)


def test_resnet_return_stats_match_output():
    """ResnetBlock(fused=True, return_stats=True): the emitted stats must
    be the (sum, sumsq) of the returned tensor (post-residual)."""
    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.models.layers import ResnetBlock
    from diffusiontexturepainting_tpu.ops.gn_conv_stream import stats_of

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 8, 8, 128), jnp.float32)
    temb = jax.random.normal(key, (2, 24), jnp.float32)
    m = ResnetBlock(128, num_groups=8, fused=True)
    p = m.init(key, x, temb)["params"]
    out, st = m.apply({"params": p}, x, temb, return_stats=True)
    assert st is not None
    ref = stats_of(out)
    np.testing.assert_allclose(np.asarray(st[:, :2]), np.asarray(ref[:, :2]),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.slow
def test_unet_all_fused_matches_module():
    """Tiny UNet with every serving fusion on (resnet chains, FF kernel,
    folded Transformer2D norms) vs the plain module path: same params,
    same output within kernel tolerance."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.core.config import tiny_unet_config
    from diffusiontexturepainting_tpu.models.unet import UNet2DCondition

    cfg = tiny_unet_config()
    fcfg = dataclasses.replace(cfg, fused_resnet=True, fused_ff=True,
                               fused_norm=True)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(key, (2, 16, 16, 9), jnp.float32)
    ctx = jax.random.normal(key, (2, 14, cfg.cross_attention_dim))
    mod = UNet2DCondition(cfg)
    fus = UNet2DCondition(fcfg)
    p = mod.init(key, sample, jnp.float32(1.0), ctx)["params"]
    pf = fus.init(key, sample, jnp.float32(1.0), ctx)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    ya = mod.apply({"params": p}, sample, jnp.float32(301.0), ctx)
    yb = fus.apply({"params": p}, sample, jnp.float32(301.0), ctx)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               atol=5e-4, rtol=5e-4)


def test_resnet_skip_split_matches_concat():
    """ResnetBlock(skip=...) - split-weight concat elimination - must match
    the same block applied to the pre-concatenated input, with an identical
    param tree, in both fused and module form."""
    import jax
    import jax.numpy as jnp

    from diffusiontexturepainting_tpu.models.layers import ResnetBlock

    key = jax.random.PRNGKey(2)
    kx, ks, kt = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 8, 8, 128), jnp.float32)
    skip = jax.random.normal(ks, (2, 8, 8, 64), jnp.float32)
    temb = jax.random.normal(kt, (2, 24), jnp.float32)
    xcat = jnp.concatenate([x, skip], axis=-1)
    for fused in (False, True):
        m = ResnetBlock(128, num_groups=8, fused=fused)
        p_cat = m.init(jax.random.PRNGKey(3), xcat, temb)["params"]
        p_split = m.init(jax.random.PRNGKey(3), x, temb, skip=skip)["params"]
        assert (jax.tree_util.tree_structure(p_cat)
                == jax.tree_util.tree_structure(p_split))
        ya = m.apply({"params": p_cat}, xcat, temb)
        yb = m.apply({"params": p_cat}, x, temb, skip=skip)
        tol = 5e-4 if fused else 1e-6
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   atol=tol, rtol=tol)
        out, st = m.apply({"params": p_cat}, x, temb, skip=skip,
                          return_stats=True)
        if fused:
            from diffusiontexturepainting_tpu.ops.gn_conv_stream import (
                stats_of,
            )

            ref = stats_of(out)
            np.testing.assert_allclose(np.asarray(st[:, :2]),
                                       np.asarray(ref[:, :2]),
                                       atol=1e-3, rtol=1e-4)
