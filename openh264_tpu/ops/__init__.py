"""Device compute kernels (JAX/XLA + Pallas), oracle-tested.

The single kernel registry replaces the reference's CPU-dispatch
function-pointer tables (wels_func_ptr_def.h / InitFunctionPointers,
encoder.cpp:157): one implementation per op, batched over all MBs.
"""
