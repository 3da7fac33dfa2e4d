"""Native (C++/OpenMP) parity kernels, loaded via ctypes.

Mirrors the reference's native layer (Cython/C + OpenMP in src/m_lib/):
these are CPU oracle implementations of the pictorial-structure kernels,
used in tests to cross-check the JAX versions and available as a host
fallback.
"""

from macaque_tpu.native.build import load_native, native_available
