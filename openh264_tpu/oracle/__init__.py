"""Bit-exact numpy reference implementations ("oracles").

Every device kernel in openh264_tpu.ops has a numpy oracle here defining
its exact integer semantics, mirroring how the reference's C fallbacks
(`*_c` functions) define the semantics its SIMD kernels must reproduce
(SURVEY.md §1 / §4.1). Tests pit ops against oracles on random data.
"""
