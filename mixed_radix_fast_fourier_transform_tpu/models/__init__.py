"""End-to-end spectral models built on the transform ops."""
