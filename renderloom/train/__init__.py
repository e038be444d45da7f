"""Functional trainers: masked-L1 motion training, TTUR hinge-GAN training."""
