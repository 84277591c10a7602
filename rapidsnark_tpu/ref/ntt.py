"""Fr NTT in pure Python — the executable spec for the TPU NTT.

Convention (matches ffjavascript/ffiasm, which interoperate bit-exactly
with the reference's FFT<Fr> at /root/reference/src/groth16.cpp:99-155):

    fft(a)[i]  = sum_k a[k] * w^(i*k)   mod r,  w = fr_w(log2 N)
    ifft       = exact inverse (fft with w^-1, scaled by N^-1)

Note the representation subtlety from SURVEY.md §3.1: the reference's FFT
applies root tables *stored in Montgomery form* through Montgomery
multiplication, which multiplies the stored bytes by the *plain* root
values. Hence on stored integers the transform is exactly the plain DFT
above, whatever representation the payload is in.
"""

from __future__ import annotations

from .field import R_FR, fr_w


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def fft(a, inverse: bool = False):
    """Iterative radix-2 DIT NTT over Fr. Natural order in and out."""
    n = len(a)
    assert _is_pow2(n)
    power = n.bit_length() - 1
    w = fr_w(power)
    if inverse:
        w = pow(w, -1, R_FR)
    # bit-reversal permutation
    a = list(a)
    j = 0
    for i in range(1, n):
        bit = n >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            a[i], a[j] = a[j], a[i]
    # butterflies
    length = 2
    while length <= n:
        wlen = pow(w, n // length, R_FR)
        half = length // 2
        for start in range(0, n, length):
            wcur = 1
            for k in range(start, start + half):
                u = a[k]
                v = a[k + half] * wcur % R_FR
                a[k] = (u + v) % R_FR
                a[k + half] = (u - v) % R_FR
                wcur = wcur * wlen % R_FR
        length <<= 1
    if inverse:
        ninv = pow(n, -1, R_FR)
        a = [x * ninv % R_FR for x in a]
    return a


def ifft(a):
    return fft(a, inverse=True)
