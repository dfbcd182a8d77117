"""convsep_tpu — a TPU-native audio source-separation framework.

A from-scratch rebuild of the capabilities of MTG/DeepConvSep (reference
survey: SURVEY.md) designed for TPU hardware: the STFT analysis/resynthesis
chain, the convolutional encoder-decoder separation models, generalized
Wiener time-frequency masking, training with interference-penalty losses,
and whole-track fused separation run as single XLA programs, sharded over
device meshes with jax.sharding.

Layout (SURVEY.md §7):
  dsp/         STFT / iSTFT / windows (+ Pallas kernels)
  data/        wav + tensor-file I/O, segmentation, pipelines, synthetic fixtures
  models/      flax conv encoder-decoder + Wiener masks
  train/       losses, optimizers (Lasagne-parity adadelta), training loop
  separate/    fused whole-track separation + batched streaming
  distributed/ mesh construction, halo overlap-add primitive
  ckpt/        orbax checkpointing + reference (Theano pickle) converter
  eval/        BSS Eval (SDR/SIR/SAR) in numpy
  score/       score-informed (Bach10) time-frequency mask generation
  configs/     per-dataset presets (iKala, DSD100, Bach10, high-res 4096)
"""

__version__ = "0.1.0"
