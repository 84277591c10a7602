"""JAX/Pallas compute kernels: multi-limb field arithmetic, NTT, MSM."""
