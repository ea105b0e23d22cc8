"""Device-side compute ops (JAX/XLA/Pallas) for grakel_tpu."""
