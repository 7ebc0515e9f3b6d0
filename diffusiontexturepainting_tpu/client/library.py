"""Client model registry: name -> inpainter factory.

Analog of the reference's kit_app/.../inference/library.py:15-34.
"""

from __future__ import annotations

from .mock_model import MockConditionalInpainter

MODEL_LIBRARY = {
    "Mock": lambda: MockConditionalInpainter(256),
}


def add_remote_model(url: str, name: str = "AI Brush (remote)", resolution: int = 256):
    """Register a websocket-backed model under `name`."""

    def _factory():
        from .websocket_model import WebsocketConditionalInpainter

        return WebsocketConditionalInpainter(url, resolution=resolution)

    MODEL_LIBRARY[name] = _factory
    return name


def add_tpu_model(name: str = "AI Brush (local TPU)", resolution: int = 256, **kwargs):
    """Register an in-process TPU model under `name`."""

    def _factory():
        from ..pipeline.tpu_model import TPUConditionalInpainter

        return TPUConditionalInpainter(resolution, **kwargs)

    MODEL_LIBRARY[name] = _factory
    return name


def load_model(name: str):
    return MODEL_LIBRARY[name]()


def model_names():
    return list(MODEL_LIBRARY.keys())
