"""multimodal_diffusion_tpu — TPU-native audio<->video cross-modal diffusion.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
PyTorch reference `mauruszach/multimodal_diffusion` (see SURVEY.md):
3-D video VAE + 1-D audio codec latents, tube/chunk tokenization, a shared
MMDiT denoiser with per-modality epsilon heads, any->any DDPM training with
classifier-free guidance, scan-compiled DDIM sampling in both directions,
sliding-window streaming inference, and offline eval tools.

Layout
------
  ops/       pure-jnp diffusion math + tokenization + Pallas kernels
  models/    Flax modules (VAE, codec, MMDiT core, heads, adapters)
  parallel/  device mesh + sharding rules (pjit over ICI)
  datasets/  manifest dataset + collate + host prefetch pipeline
  train/     jitted train step, optimizer/EMA, checkpointing, CLI
  infer/     scan-DDIM sampler with batched CFG, streaming CLI
  eval/      AV-sync / audio-quality / video-metric tools (host-side numpy)
  media/     wav/frames/mp4 I/O without librosa/soundfile deps
  utils/     config merge/expansion, atomic I/O, metric writers
"""

__version__ = "0.1.0"
