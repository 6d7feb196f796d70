"""Double-precision CPU reference implementations ("oracles").

These reproduce the reference CPU semantics exactly (reference:
ohm/RayMapperOccupancy.cpp, ohm/RayMapperNdt.cpp, ohm/RayMapperTsdf.cpp,
ohm/LineWalkCompute.h) and serve as the ground truth for differential tests
against the TPU pipeline — mirroring the reference's CPU-vs-GPU test strategy
(tests/ohmtestgpu/GpuMapTest.cpp compareMaps).  They are written for clarity
and exactness, not speed.
"""
