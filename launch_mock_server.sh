#!/bin/bash
# Protocol-compatible mock server (no TPU) for UI/client development.
set -e
cd "$(dirname "$0")"
exec python -m diffusiontexturepainting_tpu.serving.run --port "${PORT:-6060}" --mock "$@"
