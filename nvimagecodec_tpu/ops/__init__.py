"""Device-side ops (JAX/XLA/Pallas): DCT, color, resampling, convert, DWT."""
