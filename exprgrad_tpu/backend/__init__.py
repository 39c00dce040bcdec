"""XLA/Pallas backend: lowers structured kernel IR to TPU programs."""
