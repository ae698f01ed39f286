"""slr_tpu: a TPU-native differentiable spectral Monte Carlo renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
SLR renderer (C++ CPU path tracer): full spectral rendering, a rich BSDF/
texture set, PT/BPT light transport, scene DSL — rebuilt as flat SoA scenes,
wavefront kernels and counter-based RNG so the whole render loop jits, shards
over device meshes, and differentiates.
"""

__version__ = "0.1.0"
