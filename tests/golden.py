"""Pure-Python golden model of the reference CKKS math core.

Exact big-integer re-implementations (slow, small-N only) used as the
oracle for the JAX device kernels. Each function follows the reference
algorithm cited in its docstring; all arithmetic is canonical mod q.
"""

from __future__ import annotations

from ace_tpu.utils import number_theory as nt


def bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


class GoldenNtt:
    """Reference-convention negacyclic NTT for one prime (ntt.c:80-353)."""

    def __init__(self, degree: int, q: int):
        self.n = degree
        self.q = q
        bits = degree.bit_length() - 1
        psi = nt.root_of_unity(2 * degree, q)
        psi_inv = nt.mod_inv(psi, q)
        self.rou = [0] * degree
        self.rou_inv = [0] * degree
        pw, pwi = 1, 1
        for i in range(degree):
            self.rou[bit_reverse(i, bits)] = pw
            self.rou_inv[bit_reverse(i, bits)] = pwi
            pw = pw * psi % q
            pwi = pwi * psi_inv % q
        self.n_inv = nt.mod_inv(degree, q)

    def fwd(self, coeffs: list[int]) -> list[int]:
        n, q = self.n, self.q
        d = [c % q for c in coeffs]
        m = 1
        while m < n:
            t = n // (2 * m)
            for i in range(m):
                w = self.rou[m + i]
                base = i * 2 * t
                for j in range(base, base + t):
                    y = d[j + t] * w % q
                    d[j], d[j + t] = (d[j] + y) % q, (d[j] - y) % q
            m *= 2
        return d

    def inv(self, values: list[int]) -> list[int]:
        n, q = self.n, self.q
        d = list(values)
        m = n // 2
        first = True
        while m >= 1:
            t = n // (2 * m)
            for i in range(m):
                w = self.rou_inv[m + i]
                base = i * 2 * t
                for j in range(base, base + t):
                    lo, hi = d[j], d[j + t]
                    s = (lo + hi) % q
                    df = (lo - hi) * w % q
                    if first:
                        s = s * self.n_inv % q
                        df = df * self.n_inv % q
                    d[j], d[j + t] = s, df
            m //= 2
            first = False
        return d


def negacyclic_mul(a: list[int], b: list[int], q: int) -> list[int]:
    """Schoolbook negacyclic convolution mod (x^n + 1, q)."""
    n = len(a)
    res = [0] * n
    for i in range(n):
        for j in range(n):
            k = i + j
            if k < n:
                res[k] = (res[k] + a[i] * b[j]) % q
            else:
                res[k - n] = (res[k - n] - a[i] * b[j]) % q
    return res
