"""TPU compute kernels (JAX/XLA, Pallas for hot paths).

These replace the reference's OpenCL/CUDA device code (ohmgpu/gpu/*.cl).
The key architectural translation (SURVEY.md section 7): per-ray CAS loops
become expand -> sort -> segment-reduce -> scatter, which is conflict-free
and deterministic on TPU.
"""
