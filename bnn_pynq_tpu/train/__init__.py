"""Training stack: STE quantizers, flax models, optax trainer."""
