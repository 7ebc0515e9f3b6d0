#!/bin/bash
# Provision a Cloud TPU VM to serve the texture-painting inference server.
#
# The TPU-native analog of the reference's container image
# (trt_inference/Dockerfile): on TPU the runtime is the TPU VM itself
# (libtpu ships with the VM image; there is no driver/daemon container to
# bundle), so deployment = install the package + prime the compile cache
# + install the service unit. Idempotent; run as root on a v5e VM, e.g.
#
#   gcloud compute tpus tpu-vm create dtp-serve-0 \
#       --accelerator-type v5litepod-1 --version v2-alpha-tpuv5-lite
#   gcloud compute tpus tpu-vm ssh dtp-serve-0 -- \
#       "sudo bash -s" < deploy/provision_tpu_vm.sh
set -euo pipefail

REPO_DIR=${REPO_DIR:-/opt/dtp-tpu}
PORT=${PORT:-6060}
CHECKPOINT_DIR=${CHECKPOINT_DIR:-}

if [ ! -d "$REPO_DIR" ]; then
    echo "copy or clone the repository to $REPO_DIR first" >&2
    exit 1
fi

python3 -m pip install --quiet --upgrade \
    "jax[tpu]" flax optax orbax-checkpoint einops pillow tornado websockets

# native I/O runtime (optional: serving falls back to numpy if absent)
make -C "$REPO_DIR/native" || true

# Prime the persistent XLA compile cache so service (re)starts are
# seconds, not minutes (the analog of shipping prebuilt TRT .plan files:
# reference utilities.py:224-236). Compiles the default operating points.
cd "$REPO_DIR"
python3 - <<'PY'
from diffusiontexturepainting_tpu.pipeline.tpu_model import TPUConditionalInpainter
m = TPUConditionalInpainter(resolution=256, warmup=True)
print("compile cache primed")
PY

sed -e "s|@REPO_DIR@|$REPO_DIR|g" -e "s|@PORT@|$PORT|g" \
    -e "s|@CHECKPOINT_ARG@|${CHECKPOINT_DIR:+--checkpoint_dir $CHECKPOINT_DIR}|g" \
    "$REPO_DIR/deploy/dtp-server.service.in" \
    > /etc/systemd/system/dtp-server.service
systemctl daemon-reload
systemctl enable --now dtp-server
systemctl status dtp-server --no-pager
