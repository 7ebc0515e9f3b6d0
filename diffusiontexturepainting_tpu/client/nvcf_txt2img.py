"""Prompt -> brush image via a hosted text-to-image endpoint.

Analog of the reference's NVCF SDXL-Turbo client
(kit_app/.../inference/nvcf_txt2img.py:21-52). Network access is gated:
in air-gapped deployments `generate_brush_from_prompt` raises a clear
error instead of hanging; a local fallback produces a procedural brush so
the painting flow stays usable.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import urllib.request

import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_INVOKE_URL = (
    "https://ai.api.nvidia.com/v1/genai/stabilityai/sdxl-turbo")


def generate_brush_from_prompt(prompt: str, api_key: str,
                               invoke_url: str = DEFAULT_INVOKE_URL,
                               steps: int = 2, size: int = 256,
                               timeout: float = 30.0) -> np.ndarray:
    """POST the prompt to the hosted endpoint; returns (size, size, 3)
    uint8 center-cropped brush image. Raises RuntimeError on network or
    API failure."""
    if not api_key:
        raise RuntimeError("no API key configured for txt2img")
    body = json.dumps({
        "text_prompts": [{"text": prompt}],
        "seed": 0,
        "sampler": "K_EULER_ANCESTRAL",
        "steps": steps,
    }).encode()
    req = urllib.request.Request(
        invoke_url, data=body,
        headers={"Authorization": f"Bearer {api_key}",
                 "Accept": "application/json",
                 "Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            payload = json.loads(resp.read())
    except Exception as e:
        raise RuntimeError(f"txt2img request failed: {e}") from e
    try:
        b64 = payload["artifacts"][0]["base64"]
    except (KeyError, IndexError) as e:
        raise RuntimeError(f"unexpected txt2img response: {payload}") from e
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    arr = np.asarray(img)
    h, w = arr.shape[:2]
    top, left = max(0, (h - size) // 2), max(0, (w - size) // 2)
    return arr[top : top + size, left : left + size]


def procedural_brush(prompt: str, size: int = 256) -> np.ndarray:
    """Deterministic offline fallback: a colored-noise texture seeded by
    the prompt, so UI flows can be exercised without network access.
    Seeded via sha256, NOT hash(): the builtin str hash is salted per
    process (PYTHONHASHSEED), which silently broke the documented
    same-prompt-same-texture determinism across runs."""
    import hashlib

    seed = int.from_bytes(
        hashlib.sha256(prompt.encode("utf-8")).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    base = rng.random((size // 8, size // 8, 3))
    img = np.kron(base, np.ones((8, 8, 1)))
    img += 0.15 * rng.standard_normal((size, size, 3))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def brush_from_prompt(prompt: str, size: int = 256,
                      api_key: str | None = None) -> np.ndarray:
    """Fallback chain: hosted txt2img when an API key is available
    (argument or DTP_NVCF_API_KEY env var), deterministic procedural
    texture otherwise. Never raises on missing network."""
    import os

    key = api_key or os.environ.get("DTP_NVCF_API_KEY", "")
    if key:
        try:
            return generate_brush_from_prompt(prompt, key, size=size)
        except RuntimeError as e:
            logger.warning("txt2img failed (%s); using procedural brush", e)
    return procedural_brush(prompt, size=size)
