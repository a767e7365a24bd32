"""Compute ops: factorization, twiddles, FFT cores, Pallas kernels."""
