"""pacingpseudo_tpu — a TPU-native (JAX/XLA/Flax/pjit/Pallas) framework for
non-iterative scribble-supervised medical image segmentation.

Re-designed from scratch with the capabilities of the PyTorch reference
``zefanyang/pacingpseudo`` (see SURVEY.md for the component inventory), but
built TPU-first:

* all tensors are NHWC (TPU-native layout), static shapes everywhere,
* the augmentation engine runs **on device**, with every geometric transform
  fused into a single inverse-coordinate warp per sample,
* the siamese weak/strong two-stream forward can run as one fused
  batch-of-2N application so the MXU sees large matmuls,
* losses are pure functions fused by XLA (with an optional Pallas fused-loss
  kernel for the multi-loss reduction over logits),
* data parallelism is first class: ``jax.sharding.Mesh`` + ``NamedSharding``
  over a 1-D ``data`` axis, with cross-replica BatchNorm by construction,
* checkpoints are Orbax with save **and resume** (the reference only saves).

Layout:
    losses/    pure loss functions (reference: losses/losses.py)
    models/    Flax UNet, AuxPath + memory bank, siamese pacing model
    aug/       on-device augmentation engine + per-dataset presets
    data/      host-side .npz slice pipeline, fold splits, synthetic data
    train/     schedules, train state, jitted train/eval steps, epoch loop
    evals/     Dice (on-device + numpy parity), HD95 (medpy-compatible), CLI
    parallel/  device mesh + sharding specs
    ops/       resampling / blur primitives and Pallas kernels
    tools/     artificial-scribble generation and scribble shortening
    utils/     meters, logging, tensorboard helpers
    cli/       argv-compatible train / upper-bound / inference drivers
"""

__version__ = "0.1.0"
