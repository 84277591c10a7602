"""Pure-Python BN254 golden model.

This sub-package is the executable specification and test oracle for the
TPU compute path. It plays the role snarkjs plays for the reference
(README.md:44-53 of /root/reference positions rapidsnark as a drop-in for
`snarkjs groth16 prove`, with snarkjs verification as the de-facto
integration test): proofs produced by the TPU prover are verified here
with a full optimal-ate pairing, with no network or external tooling.

Everything here is plain Python integers — slow, simple, auditable.
"""

from .field import P, R_FR  # noqa: F401
