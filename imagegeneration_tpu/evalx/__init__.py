"""Offline evaluation: discriminator-feature FID and VGG perception distance."""
