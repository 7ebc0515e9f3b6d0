"""CLIP text encoder vs the torch oracle (transformers.CLIPTextModel).

Reference parity target: the `text_embeddings` output of the reference's
CLIP TRT engine (models.py:943-1009, last hidden state) and the
encode_prompt semantics of stable_diffusion_pipeline.py:369-405.
Config-only torch models (random init) - no checkpoint downloads.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusiontexturepainting_tpu.core.config import CLIPTextConfig  # noqa: E402
from diffusiontexturepainting_tpu.models.clip_text import (  # noqa: E402
    CLIPTextEncoder,
    encode_prompt,
)
from diffusiontexturepainting_tpu.weights.convert import (  # noqa: E402
    convert_clip_text,
)


def _hf_text_config(tiny: bool):
    from transformers import CLIPTextConfig as HFConfig

    if tiny:
        return HFConfig(vocab_size=1000, hidden_size=64,
                        intermediate_size=128, num_hidden_layers=2,
                        num_attention_heads=4, max_position_embeddings=16,
                        hidden_act="quick_gelu")
    return HFConfig(hidden_act="quick_gelu")  # SD-1.5 text tower defaults


def _ours_from_hf(hf_cfg):
    return CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        max_length=hf_cfg.max_position_embeddings)


@pytest.mark.parametrize("tiny", [
    True,
    pytest.param(False, marks=pytest.mark.slow),  # 12-layer 77-token tower
], ids=["tiny", "sd15_text_shape"])
def test_clip_text_matches_transformers(tiny):
    """Our last hidden state == CLIPTextModel.last_hidden_state (the TRT
    engine's `text_embeddings` output, reference models.py:952)."""
    from transformers import CLIPTextModel

    hf_cfg = _hf_text_config(tiny)
    torch.manual_seed(7)
    hf = CLIPTextModel(hf_cfg).eval()

    rng = np.random.default_rng(11)
    L = hf_cfg.max_position_embeddings
    ids = rng.integers(0, hf_cfg.vocab_size, (2, L)).astype(np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids).long()
                 ).last_hidden_state.numpy()

    cfg = _ours_from_hf(hf_cfg)
    params = {k: v.detach().cpu().numpy()
              for k, v in hf.state_dict().items()}
    tree = convert_clip_text(params, num_layers=cfg.num_layers)
    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    out = CLIPTextEncoder(cfg).apply({"params": tree}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)


def test_encode_prompt_semantics():
    """encode_prompt returns concat([uncond, cond]) in the requested
    dtype (reference stable_diffusion_pipeline.py:398-400: negative
    first, cast to the engine dtype)."""
    hf_cfg = _hf_text_config(True)
    cfg = _ours_from_hf(hf_cfg)
    model = CLIPTextEncoder(cfg)
    rng = np.random.default_rng(0)
    L = cfg.max_length
    cond_ids = rng.integers(0, cfg.vocab_size, (1, L)).astype(np.int32)
    uncond_ids = rng.integers(0, cfg.vocab_size, (1, L)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(cond_ids))

    apply_fn = lambda p, ids: model.apply(p, ids)
    emb = encode_prompt(apply_fn, params, cond_ids, uncond_ids,
                        dtype=jnp.bfloat16)
    assert emb.shape == (2, L, cfg.hidden_size)
    assert emb.dtype == jnp.bfloat16
    cond = apply_fn(params, jnp.asarray(cond_ids)).astype(jnp.bfloat16)
    uncond = apply_fn(params, jnp.asarray(uncond_ids)).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(emb[1]), np.asarray(cond[0]))
    np.testing.assert_array_equal(np.asarray(emb[0]), np.asarray(uncond[0]))


def test_encode_prompt_broadcasts_single_negative():
    """A batch of prompts with ONE negative prompt: the uncond half is
    tiled to the cond batch (the reference tokenizes both to the same
    batch, stable_diffusion_pipeline.py:390-394) so a downstream midpoint
    CFG split stays balanced; a 2-vs-3 mismatch is rejected."""
    cfg = _ours_from_hf(_hf_text_config(True))
    model = CLIPTextEncoder(cfg)
    rng = np.random.default_rng(3)
    L = cfg.max_length
    cond_ids = rng.integers(0, cfg.vocab_size, (3, L)).astype(np.int32)
    uncond_ids = rng.integers(0, cfg.vocab_size, (1, L)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(cond_ids))
    apply_fn = lambda p, ids: model.apply(p, ids)

    emb = encode_prompt(apply_fn, params, cond_ids, uncond_ids,
                        dtype=jnp.float32)
    assert emb.shape == (6, L, cfg.hidden_size)
    uncond = np.asarray(apply_fn(params, jnp.asarray(uncond_ids)))
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(emb[b]), uncond[0])

    with pytest.raises(ValueError, match="negative_prompt batch"):
        encode_prompt(apply_fn, params, cond_ids, cond_ids[:2])


def test_text_encoder_checkpoint_roundtrip(tmp_path):
    """convert -> text_encoder.npz -> load_text_encoder reproduces the
    torch tower's output (the --text-encoder CLI path)."""
    from transformers import CLIPTextModel

    from diffusiontexturepainting_tpu.weights.loader import (
        load_text_encoder,
        save_component,
    )

    hf_cfg = _hf_text_config(True)
    torch.manual_seed(1)
    hf = CLIPTextModel(hf_cfg).eval()
    cfg = _ours_from_hf(hf_cfg)
    tree = convert_clip_text(
        {k: v.detach().cpu().numpy() for k, v in hf.state_dict().items()},
        num_layers=cfg.num_layers)
    save_component(str(tmp_path / "text_encoder.npz"), tree)
    loaded = load_text_encoder(str(tmp_path))
    assert loaded is not None
    assert load_text_encoder(str(tmp_path / "nope")) is None

    # optional structure/shape validation against an expected tree (the
    # same _validate pass the pipeline components get)
    expected = CLIPTextEncoder(cfg).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.max_length), jnp.int32))["params"]
    assert load_text_encoder(str(tmp_path), reference=expected) is not None
    bad = dict(expected)
    bad["bogus_extra"] = np.zeros((1,))
    with pytest.raises(ValueError, match="checkpoint mismatch"):
        load_text_encoder(str(tmp_path), reference=bad)

    ids = np.arange(2 * cfg.max_length).reshape(2, -1) % hf_cfg.vocab_size
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids).long()
                 ).last_hidden_state.numpy()
    out = CLIPTextEncoder(cfg).apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, loaded)},
        jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)


def test_encode_prompt_string_requires_tokenizer_dir():
    cfg = _ours_from_hf(_hf_text_config(True))
    model = CLIPTextEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.max_length), jnp.int32))
    with pytest.raises(ValueError, match="tokenizer_dir"):
        encode_prompt(lambda p, i: model.apply(p, i), params,
                      "mossy stone", "")
