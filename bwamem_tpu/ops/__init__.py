"""Compute kernels. Each op ships as three twins sharing one semantics:

  *_ref.py    — scalar numpy golden reference (the "software model")
  *_jax.py    — batched vectorized pure-JAX (interpreter twin; any backend)
  *_pallas.py — Pallas TPU kernel (the production fast path)

This mirrors the reference's verification story (SURVEY.md §4): the FPGA ran
the same host against an RTL simulator (ASE) or real hardware behind one
swappable transport; here the pallas/jax/ref twins sit behind one interface
and are fuzz-tested against each other.
"""
