"""ContrastiveSeg-TPU: a TPU-native semantic-segmentation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
tfzhou/ContrastiveSeg ("Exploring Cross-Image Pixel Contrast for Semantic
Segmentation", ICCV 2021): config-driven training/eval of segmentation
models (HRNet, ResNet/DeepLab, ...) with a supervised pixel-wise
contrastive loss and a cross-image memory bank.

Design tenets (vs. the CUDA/torch reference):
  * pure-functional models (flax.linen) with one jitted train_step;
  * NHWC layouts, bf16-compute option, MXU-friendly separable resizes;
  * SyncBN by construction: batch stats are computed over the *global*
    (mesh-sharded) batch under jit, so XLA inserts the collectives;
  * static-shape masked sampling replaces the reference's per-image
    Python loops (lib/loss/loss_contrast.py:30-89);
  * memory queues live in the train state and are updated as a pure
    function, not as module buffers mutated under no_grad.
"""

__version__ = "0.1.0"
