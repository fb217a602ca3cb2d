"""Model zoo: SNDCGAN, WGAN, CycleGAN architectures as Flax modules."""
