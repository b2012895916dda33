"""hikari_tpu — a TPU-native, physically-based spectral path tracer.

Built from scratch in JAX/XLA/Pallas with the capabilities of Hikari.jl
(surveyed at /root/reference; see SURVEY.md). The KernelAbstractions
megakernel + atomic work-queue design of the reference is replaced by a
wavefront architecture idiomatic to TPUs: dense SoA path-state arrays with
masked lanes, material-typed dense dispatch, vectorized stackless BVH
traversal, and scatter-free film accumulation.
"""

__version__ = "0.1.0"
