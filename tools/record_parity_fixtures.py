"""Record tiny-config parity fixtures from the hand-torch oracles.

The real shipped checkpoints (reference trt_model.py:48-61) are not
available in this environment, so tools/parity_harness.py's check path
(recording file -> weights/convert.py -> Flax forward -> max-abs-diff)
would otherwise never execute end-to-end. This records the tiny-config
torch oracles from tests/test_torch_parity_assembled.py into
self-contained .npz fixtures (inputs + outputs + the diffusers-named
state dict embedded under "sd." keys) committed at tests/fixtures/parity,
which tests/test_parity_harness.py feeds through the harness in CI.

Re-run after changing the oracles or the fixture schema:
  PYTHONPATH=/root/repo python tools/record_parity_fixtures.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = os.path.join(REPO, "tests", "fixtures", "parity")


def main():
    import torch

    from tests.test_torch_parity_assembled import TorchTinyUNet, TorchTinyVAE

    os.makedirs(OUT_DIR, exist_ok=True)
    t32 = lambda x: torch.from_numpy(np.asarray(x, np.float32))

    def save(name, inputs, outputs, state_dict):
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(
            path,
            **{f"in_{k}": v for k, v in inputs.items()},
            **{f"out_{k}": v for k, v in outputs.items()},
            **{f"sd.{k}": np.asarray(v) for k, v in state_dict.items()})
        print(f"{path}: {os.path.getsize(path) / 1e6:.2f} MB, "
              f"{len(state_dict)} weights")

    # same seeds/shapes as the assembled parity tests, so the fixtures
    # pin exactly the oracle graphs those tests pin
    torch.manual_seed(0)
    unet = TorchTinyUNet().eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 16, 16)).astype(np.float32)
    ctx = rng.standard_normal((2, 14, 32)).astype(np.float32)
    ts = np.array([3.0, 511.0], np.float32)
    with torch.no_grad():
        eps = unet(t32(x), t32(ts), t32(ctx)).numpy()
    save("unet", {"sample_nchw": x, "timestep": ts, "ctx": ctx},
         {"eps_nchw": eps}, unet.diffusers_state_dict())

    torch.manual_seed(1)
    vae = TorchTinyVAE().eval()
    img = np.random.default_rng(1).standard_normal(
        (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        moments = vae.encode(t32(img)).numpy()
    save("vae_encoder", {"image_nchw": img}, {"moments_nchw": moments},
         vae.diffusers_state_dict())

    lat = np.random.default_rng(2).standard_normal(
        (2, 4, 4, 4)).astype(np.float32)
    with torch.no_grad():
        dec = vae.decode(t32(lat)).numpy()
    save("vae_decoder", {"latents_nchw": lat}, {"image_nchw": dec},
         vae.diffusers_state_dict())


if __name__ == "__main__":
    main()
