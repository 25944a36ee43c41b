"""Hand-written Pallas TPU kernels (selected via ops backend 'pallas').

Kernels run compiled on TPU and in interpreter mode on CPU (so the parity
test-suite exercises the same code paths without hardware).
"""
