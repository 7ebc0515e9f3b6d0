"""Framework settings (the analog of the reference's carb settings +
VERBOSE_MODE flag, kit_app/.../util/settings.py:11, extension.toml:67-69).

Resolution order: environment variable > programmatic override > default.
"""

from __future__ import annotations

import os

_OVERRIDES: dict = {}

DEFAULTS = {
    "DTP_VERBOSE": "0",
    "DTP_SERVER_URL": "ws://localhost:6060/websocket/",
    "DTP_RESOLUTION": "256",
    "DTP_CACHE_DIR": os.path.join(os.path.expanduser("~"), ".cache", "dtp_tpu"),
    "DTP_NVCF_API_KEY": "",
}


def get(name: str, default=None) -> str:
    if name in os.environ:
        return os.environ[name]
    if name in _OVERRIDES:
        return _OVERRIDES[name]
    return DEFAULTS.get(name, default)


def set_override(name: str, value):
    _OVERRIDES[name] = str(value)


def verbose() -> bool:
    return get("DTP_VERBOSE") not in ("0", "", "false", "False")
