"""Measured performance studies — NOT part of the production compute path.

Round-1 conv-kernel experiments that informed the framework's design (the
conclusion, chronicled in BASELINE.md: XLA's direct conv is already at the
thin-channel roofline for these U-Nets, so the production lever is the
space-to-depth model family, not a hand-written conv kernel). Each module
is a real, tested implementation kept for its measurements and rationale:

- ``pallas_conv2d``       — direct 3x3 conv Pallas kernel (halo DMA)
- ``pallas_conv2d_gemm``  — im2col+GEMM formulation
- ``pallas_conv2d_gemm2`` — aligned-GEMM successor
- ``winograd``            — Winograd F(2x2,3x3) in pure XLA

Import explicitly (``from sequitr_tpu.studies import winograd``); nothing
here is re-exported into ``sequitr_tpu.ops``.
"""
