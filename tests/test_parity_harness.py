"""The recorded-activation parity harness runs end-to-end in CI.

The real shipped checkpoints (reference trt_model.py:48-61:
image_encoder.pth + SD-1.5-inpaint + LoRA) are unavailable in this
environment, so these tests drive tools/parity_harness.py's CHECK path
(recording .npz -> embedded torch state dict -> weights/convert.py ->
Flax forward -> max-abs-diff gate) against committed tiny-config
fixtures recorded from the hand-torch oracles
(tools/record_parity_fixtures.py). When real checkpoints become
available, the identical command validates them:

  python tools/parity_harness.py check rec/unet.npz --state-dict unet_sd.pt
"""

import os
import sys

import pytest

pytest.importorskip("torch")  # fixtures were recorded against torch oracles

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "parity")

# full tiny graphs jitted on CPU
pytestmark = pytest.mark.slow


def _run_check(component):
    sys.path.insert(0, os.path.join(os.path.dirname(FIXTURES), "..", ".."))
    from tools.parity_harness import main

    rc = main(["check", os.path.join(FIXTURES, f"{component}.npz"),
               "--config", "tiny", "--atol", "1e-4"])
    assert rc == 0, f"parity harness FAIL for {component}"


@pytest.mark.parametrize("component", ["unet", "vae_encoder", "vae_decoder"])
def test_parity_harness_fixture(component):
    _run_check(component)
