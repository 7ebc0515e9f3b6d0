"""TPU-native Diffusion Texture Painting framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
nv-tlabs/DiffusionTexturePainting: interactive AI texture painting where each
brush stamp runs a Stable-Diffusion-1.5 inpainting pipeline (LoRA-finetuned,
conditioned on a reference texture image through a multi-scale CLIP patch
encoder) compiled to fused XLA/Pallas programs on TPU, behind the same binary
websocket protocol the reference's Omniverse Kit client speaks.

Layer map (mirrors SURVEY.md section 1, re-designed TPU-first):
  serving/   - websocket server + wire protocol (reference: trt_inference/run.py,
               handler.py, server_io.py)
  pipeline/  - the jitted inpainting stamp program (reference:
               inpaint_pipeline.py, stable_diffusion_pipeline.py)
  models/    - Flax modules: SD-1.5 inpaint UNet, VAE, CLIP ViT-B/32 vision,
               ConditionPatchEncoder (reference: models.py, image_encoder.py)
  schedulers/- DDIM/DPM++/EulerAncestral/PNDM/LMS with precomputed tables
               (reference: utilities.py:267-1127)
  ops/       - Pallas/XLA kernels: flash attention, dilation, resize, raster
               (reference: TRT plugins fMHCA/fMHA, kornia, kaolin)
  training/  - data-parallel LoRA + image-encoder finetune (reference: training/)
  client/    - headless painting client: mock model, websocket model, painter
               (reference: kit_app extension python/)
  parallel/  - mesh construction and sharding rules (reference: accelerate/NCCL)
  weights/   - torch checkpoint -> JAX pytree converters, random init
"""

__version__ = "0.1.0"
