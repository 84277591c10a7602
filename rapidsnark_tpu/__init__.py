"""rapidsnark_tpu — a TPU-native Groth16 (BN254) zkSNARK prover.

A from-scratch re-design of the capabilities of iden3/rapidsnark-old
(reference: /root/reference, see SURVEY.md) for TPU hardware:

- BN254 Fq/Fr arithmetic as vectorized multi-limb Montgomery kernels
  (16 x 16-bit limbs in uint32), lowered through JAX/XLA and Pallas
  (replaces ffiasm's generated x86-64 ADX assembly, SURVEY.md 2.12).
- Radix-2 NTT over Fr with the snarkjs/ffiasm coset-shift convention
  (reference groth16.cpp:101-155).
- Pippenger MSM over G1/G2 formulated TPU-first: sort-by-digit +
  work-efficient associative prefix scan instead of data-dependent
  bucket scatter (reference: ffiasm multiexp.cpp behind
  g1.multiMulByScalar, groth16.cpp:173-204).
- snarkjs-compatible .zkey / .wtns parsing and proof.json/public.json
  emission (reference src/binfile_utils.cpp, zkey_utils.cpp,
  wtns_utils.cpp, main_prover.cpp:77-93).
- A CLI (reference src/main_prover.cpp) and an HTTP proof server with
  the same state machine (reference src/fullprover.cpp, proverapi.cpp).

Layout:
  ref/       pure-Python BN254 golden model (fields, curves, pairing,
             Groth16 verify) — the test oracle replacing snarkjs.
  ops/       JAX/Pallas compute kernels: bigint limb ops, NTT, MSM.
  models/    protocol cores (Groth16 prover orchestration).
  parallel/  mesh sharding: multi-chip MSM and distributed NTT.
  io/        binfile container, zkey, wtns readers/writers.
  utils/     logging/tracing, config.
  server/    proof service (REST API + prover state machine).
"""

__version__ = "0.1.0"
