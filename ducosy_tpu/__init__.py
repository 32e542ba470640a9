"""ducosy_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of DuCoSy-GAN.

DuCoSy-GAN synthesizes contrast-enhanced chest CT (CECT) from non-contrast CT
(NCCT) by training two HU-range-specialized CycleGANs — soft-tissue
(-150..250 HU) and lung (-1000..-150 HU) — and complementarily compositing
their outputs back into full-range DICOM series.

This package is a from-scratch framework, not a port: NHWC layouts, Flax
modules, jit/shard_map data parallelism over a TPU mesh, Pallas kernels on the
hot normalization/attention path, and a self-contained DICOM codec (the
environment has no pydicom).

Layout (maps onto SURVEY.md §2's component inventory):
  dicom/     DICOM + NIfTI codecs, tag surgery
  ops/       HU transforms, resize, filters, Pallas kernels
  models/    Generator (ResNet-9+CBAM), PatchGAN discriminator, UNet3D
  losses/    GAN/cycle/identity/gradient/SSIM/contrast losses
  data/      patient pairing, slice dataset, prefetching host loader
  masks/     anatomical mask generation, TotalSegmentator driver
  parallel/  device mesh + sharding helpers
  train/     train state, jitted steps, loop, checkpointing
  infer/     batched dual-model generation, synthesis, 3-D postprocess
  eval/      metric suite + reports
"""

__version__ = "0.1.0"
