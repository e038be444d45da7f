"""Model zoo: motion transformer, SPADE renderer, discriminators, perceptual."""
