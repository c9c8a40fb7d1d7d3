"""Device compute layer (reference L4: `rt/rtrt/cuda.hpp` kernels,
rebuilt as batched JAX/Pallas programs over SoA scene arrays)."""
