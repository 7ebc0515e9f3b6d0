"""Recorded-activation parity harness: validate converted checkpoints
against torch in minutes.

Two halves (VERDICT r1 missing #1):

  record  - runs the TORCH side (wherever torch + diffusers/transformers
            + the real checkpoints live, e.g. the reference container)
            and saves (inputs, outputs, state_dict file ref) per
            component into .npz recordings.
  check   - runs HERE: converts the torch state_dict with
            weights/convert.py, runs our Flax tower on the recorded
            inputs, and reports max-abs-diff vs the recorded outputs.

Components: clip (transformers, recordable in this env), unet /
vae_encoder / vae_decoder (needs diffusers on the record side),
patch_encoder (point --torch-module at the reference's
image_encoder.py to record).

Examples:
  # record CLIP here (transformers is installed):
  python tools/parity_harness.py record --component clip --out rec/
  # validate our tower against it:
  python tools/parity_harness.py check rec/clip.npz --state-dict rec/clip_sd.pt

  # on a diffusers env, record the real SD-1.5-inpaint UNet:
  python tools/parity_harness.py record --component unet \
      --checkpoint runwayml/stable-diffusion-inpainting --out rec/
  # then here:
  python tools/parity_harness.py check rec/unet.npz --state-dict rec/unet_sd.pt
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------- record


def _save(out_dir, name, inputs: dict, outputs: dict, state_dict):
    import torch

    os.makedirs(out_dir, exist_ok=True)
    np.savez(os.path.join(out_dir, f"{name}.npz"),
             **{f"in_{k}": v for k, v in inputs.items()},
             **{f"out_{k}": v for k, v in outputs.items()})
    torch.save(state_dict, os.path.join(out_dir, f"{name}_sd.pt"))
    print(f"recorded {name}: "
          f"{[k + str(list(v.shape)) for k, v in inputs.items()]} -> "
          f"{[k + str(list(v.shape)) for k, v in outputs.items()]}")


def record(args):
    import torch

    rng = np.random.default_rng(0)
    t = lambda x: torch.from_numpy(np.asarray(x, np.float32))

    if args.component == "clip":
        from transformers import CLIPVisionConfig, CLIPVisionModel

        if args.checkpoint:
            model = CLIPVisionModel.from_pretrained(args.checkpoint)
        else:
            torch.manual_seed(0)
            model = CLIPVisionModel(CLIPVisionConfig(hidden_act="quick_gelu"))
        model = model.eval()
        px = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
        with torch.no_grad():
            out = model(pixel_values=t(px).permute(0, 3, 1, 2))
        _save(args.out, "clip", {"pixel_values": px},
              {"pooled": out.pooler_output.numpy()}, model.state_dict())

    elif args.component == "unet":
        from diffusers import UNet2DConditionModel  # record-side env only

        model = UNet2DConditionModel.from_pretrained(
            args.checkpoint, subfolder="unet").eval()
        sample = rng.standard_normal((3, 9, 32, 32)).astype(np.float32)
        ctx = rng.standard_normal((3, 14, 768)).astype(np.float32)
        ts = np.array([501.0, 501.0, 501.0], np.float32)
        with torch.no_grad():
            out = model(t(sample), t(ts), encoder_hidden_states=t(ctx)).sample
        _save(args.out, "unet",
              {"sample_nchw": sample, "timestep": ts, "ctx": ctx},
              {"eps_nchw": out.numpy()}, model.state_dict())

    elif args.component in ("vae_encoder", "vae_decoder"):
        from diffusers import AutoencoderKL

        model = AutoencoderKL.from_pretrained(
            args.checkpoint, subfolder="vae").eval()
        if args.component == "vae_encoder":
            img = rng.standard_normal((1, 3, 256, 256)).astype(np.float32)
            with torch.no_grad():
                moments = model.quant_conv(model.encoder(t(img)))
            _save(args.out, "vae_encoder", {"image_nchw": img},
                  {"moments_nchw": moments.numpy()}, model.state_dict())
        else:
            lat = rng.standard_normal((1, 4, 32, 32)).astype(np.float32)
            with torch.no_grad():
                img = model.decoder(model.post_quant_conv(t(lat)))
            _save(args.out, "vae_decoder", {"latents_nchw": lat},
                  {"image_nchw": img.numpy()}, model.state_dict())

    elif args.component == "patch_encoder":
        # import the reference's torch ConditionPatchEncoder from a path
        # the user supplies (we do not ship reference code)
        import importlib.util

        spec = importlib.util.spec_from_file_location("ref_ie",
                                                      args.torch_module)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        enc = mod.ConditionPatchEncoder()
        if args.checkpoint:
            enc.load_state_dict(
                torch.load(args.checkpoint, map_location="cpu"),
                strict=False)
        enc = enc.eval()
        img = rng.random((1, 3, 224, 224)).astype(np.float32)
        with torch.no_grad():
            cond = enc.encode_image(t(img))
        _save(args.out, "patch_encoder", {"image_nchw": img},
              {"cond": cond.numpy()}, enc.state_dict())
    else:
        raise SystemExit(f"unknown component {args.component}")


# ---------------------------------------------------------------------- check


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def check(args):
    import jax.numpy as jnp
    import jax

    from diffusiontexturepainting_tpu.weights import convert as C

    rec = np.load(args.recording)
    name = os.path.basename(args.recording).replace(".npz", "")
    if args.state_dict is None:
        # fixture-style recording: the torch state dict is embedded in
        # the same npz under "sd." keys (tools/record_parity_fixtures.py)
        sd = {k[len("sd."):]: rec[k] for k in rec.files
              if k.startswith("sd.")}
        if not sd:
            raise SystemExit("recording has no embedded state dict; "
                             "pass --state-dict")
    elif args.state_dict.endswith(".npz"):
        sd_npz = np.load(args.state_dict)
        sd = {k: sd_npz[k] for k in sd_npz.files}
    else:
        sd = C.load_state_dict(args.state_dict)
    tiny = args.config == "tiny"
    # tiny oracles (tests/test_torch_parity_assembled.py) use 1
    # layer/block over 4 blocks; the real SD-1.5 checkpoints use 2
    conv_kw = dict(layers_per_block=1, num_blocks=4) if tiny else {}
    to_dev = lambda tree: jax.tree_util.tree_map(jnp.asarray, tree)

    if name == "clip":
        from diffusiontexturepainting_tpu.core.config import CLIPVisionConfig
        from diffusiontexturepainting_tpu.models.clip_vit import (
            CLIPVisionTower,
        )

        params = to_dev(C.convert_clip_hf(sd))
        out = CLIPVisionTower(CLIPVisionConfig()).apply(
            {"params": params}, jnp.asarray(rec["in_pixel_values"]))
        ref = rec["out_pooled"]
    elif name == "unet":
        from diffusiontexturepainting_tpu.core.config import (
            UNetConfig,
            tiny_unet_config,
        )
        from diffusiontexturepainting_tpu.models.unet import UNet2DCondition

        params = to_dev(C.convert_unet(sd, **conv_kw))
        cfg = tiny_unet_config() if tiny else UNetConfig()
        out = UNet2DCondition(cfg).apply(
            {"params": params}, jnp.asarray(_nhwc(rec["in_sample_nchw"])),
            jnp.asarray(rec["in_timestep"]), jnp.asarray(rec["in_ctx"]))
        ref = _nhwc(rec["out_eps_nchw"])
    elif name == "vae_encoder":
        from diffusiontexturepainting_tpu.core.config import (
            VAEConfig,
            tiny_vae_config,
        )
        from diffusiontexturepainting_tpu.models.vae import VAEEncoder

        params = to_dev(C.convert_vae_encoder(sd, **conv_kw))
        cfg = tiny_vae_config() if tiny else VAEConfig()
        out = VAEEncoder(cfg).apply(
            {"params": params}, jnp.asarray(_nhwc(rec["in_image_nchw"])))
        ref = _nhwc(rec["out_moments_nchw"])
    elif name == "vae_decoder":
        from diffusiontexturepainting_tpu.core.config import (
            VAEConfig,
            tiny_vae_config,
        )
        from diffusiontexturepainting_tpu.models.vae import VAEDecoder

        params = to_dev(C.convert_vae_decoder(sd, **conv_kw))
        cfg = tiny_vae_config() if tiny else VAEConfig()
        out = VAEDecoder(cfg).apply(
            {"params": params}, jnp.asarray(_nhwc(rec["in_latents_nchw"])))
        ref = _nhwc(rec["out_image_nchw"])
    elif name == "patch_encoder":
        from diffusiontexturepainting_tpu.core.config import (
            PatchEncoderConfig,
        )
        from diffusiontexturepainting_tpu.models.patch_encoder import (
            ConditionPatchEncoder,
            encode_brush_image,
        )

        params = to_dev(C.convert_patch_encoder(sd))
        enc = ConditionPatchEncoder(PatchEncoderConfig())
        img = _nhwc(rec["in_image_nchw"])
        cond, _ = encode_brush_image(enc, params, jnp.asarray(img))
        out, ref = cond, rec["out_cond"]
    else:
        raise SystemExit(f"unknown recording {name}")

    out = np.asarray(out, np.float32)
    diff = np.abs(out - ref)
    denom = np.maximum(np.abs(ref), 1e-3)
    print(f"{name}: max abs diff {diff.max():.3e}, "
          f"max rel diff {(diff / denom).max():.3e}, "
          f"mean abs {diff.mean():.3e}")
    ok = diff.max() <= args.atol
    print("PASS" if ok else f"FAIL (atol {args.atol})")
    return 0 if ok else 1


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("record")
    r.add_argument("--component", required=True,
                   choices=["clip", "unet", "vae_encoder", "vae_decoder",
                            "patch_encoder"])
    r.add_argument("--checkpoint", default=None,
                   help="HF repo / state-dict path (random-init if omitted, "
                        "clip only)")
    r.add_argument("--torch-module", default=None,
                   help="path to the reference image_encoder.py "
                        "(patch_encoder only)")
    r.add_argument("--out", required=True)
    c = sub.add_parser("check")
    c.add_argument("recording", help="<component>.npz from record")
    c.add_argument("--state-dict", default=None,
                   help="<component>_sd.pt from record, the real checkpoint "
                        "file, or a .npz of numpy weights; omit when the "
                        "recording embeds its state dict under 'sd.' keys "
                        "(tools/record_parity_fixtures.py)")
    c.add_argument("--config", choices=["full", "tiny"], default="full",
                   help="model config the recording was made at (tiny = "
                        "the hand-torch oracle fixtures in "
                        "tests/fixtures/parity)")
    c.add_argument("--atol", type=float, default=5e-3)
    args = ap.parse_args(argv)
    if args.cmd == "record":
        record(args)
        return 0
    return check(args)


if __name__ == "__main__":
    raise SystemExit(main())
