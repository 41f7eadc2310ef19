"""scd_resnet_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for the
sperm chromatin dispersion (SCD) detection pipeline.

Built from scratch with the capabilities of the reference repository
yang-z-03/scd-resnet (CUDA/C++/torch), re-designed TPU-first:

- compute path: jit-compiled flax models, fused on-device augmentation +
  Gaussian heatmap label rendering, Pallas kernels for corner pooling and
  deformable convolution;
- parallelism: data-parallel over a ``jax.sharding.Mesh`` with XLA
  collectives riding ICI (cross-replica batch-norm statistics fall out of
  GSPMD batch reductions, replacing torch SyncBatchNorm);
- runtime: native (C++) archive reader / batch packer for the host input
  pipeline.

Layer map mirrors SURVEY.md §7: core / ops / data / models / parallel /
train / evaluations / infer.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SCD_JAX_PLATFORM"):
    # Env-var backend pinning for subprocesses (CLI tests, worker
    # processes). JAX_PLATFORMS alone is unreliable here: the machine's
    # TPU tunnel re-sets it from a sitecustomize hook, so the explicit
    # config update below is what actually selects the backend. Takes
    # effect as long as this package is imported before the first JAX
    # backend initialization.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SCD_JAX_PLATFORM"])
