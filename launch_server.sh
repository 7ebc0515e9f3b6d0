#!/bin/bash
# Launch the TPU inference server (analog of the reference's
# launch_trt_server.sh). First start compiles the configured operating
# points (~minutes); subsequent starts hit the persistent XLA cache.
set -e
cd "$(dirname "$0")"
make -C native >/dev/null 2>&1 || true
exec python -m diffusiontexturepainting_tpu.serving.run --port "${PORT:-6060}" "$@"
