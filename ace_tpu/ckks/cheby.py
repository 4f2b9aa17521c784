"""Chebyshev-series evaluation on ciphertexts (Paterson-Stockmeyer).

Replicates the reference's OpenFHE-style algorithm
(fhe-cmplr/rtlib/ant/src/util/ckks_chebyshev.c): degree-split table
(Compute_degree_ps :74), Chebyshev-basis long division
(Long_div_chebyshev :121), baby/giant power ladders with the even-poly
optimization, and the recursive inner evaluation (:330-587). Used by
the ReLU sign composite and the bootstrap sine approximation.
"""

from __future__ import annotations

import math

import numpy as np

from ace_tpu.ckks.cipher import Ciphertext

_UPPER_BOUND_PS = 2204


def _populate_param_ps() -> np.ndarray:
    ranges = [2, 11, 13, 17, 55, 59, 76, 239, 247, 284, 991, 1007, 1083,
              2015, 2031, _UPPER_BOUND_PS]
    values = [1, 2, 3, 2, 3, 4, 3, 4, 5, 4, 5, 6, 5, 6, 7, 6]
    out = np.zeros(_UPPER_BOUND_PS)
    j = 0
    for r, v in zip(ranges, values):
        out[j:r] = v
        j = r
    return out


_PARAM_PS = _populate_param_ps()


def degree_of(coeffs) -> int:
    deg = 1
    for i in range(len(coeffs) - 1, 0, -1):
        if coeffs[i] == 0:
            deg += 1
        else:
            break
    return len(coeffs) - deg


def is_even_poly(coeffs) -> bool:
    d = degree_of(coeffs)
    return all(coeffs[i] == 0 for i in range(1, d + 1, 2))


def compute_degree_ps(n: int) -> tuple[int, int]:
    assert n > 0
    if n <= _UPPER_BOUND_PS:
        m = int(_PARAM_PS[n - 1])
        k = n // ((1 << m) - 1) + 1
        return k, m
    raise NotImplementedError("degree > 2204")


def _is_not_one(v: float) -> bool:
    prec = 2.0 ** -20
    return (1 - prec >= v) or (1 + prec <= v)


def long_div_chebyshev(f: list[float], g: list[float]
                       ) -> tuple[list[float], list[float]]:
    """f = q*g + r in the Chebyshev basis (ckks_chebyshev.c:121-228)."""
    n = degree_of(f)
    k = degree_of(g)
    assert n == len(f) - 1 and k == len(g) - 1
    r = list(f)
    if n < k:
        return [0.0], r
    q = [0.0] * (n - k + 1)
    while n > k:
        q_n_k = 2 * r[-1]
        if _is_not_one(g[k]):
            q_n_k = q_n_k / g[-1]
        q[n - k] = q_n_k
        d = [0.0] * (n + 1)
        if k == n - k:
            d[0] = 2 * g[n - k]
            for i in range(1, 2 * k + 1):
                d[i] = g[abs(n - k - i)]
        elif k > n - k:
            d[0] = 2 * g[n - k]
            for i in range(1, k - (n - k) + 1):
                d[i] = g[abs(n - k - i)] + g[n - k + i]
            for i in range(k - (n - k) + 1, n + 1):
                d[i] = g[abs(i - n + k)]
        else:
            d[n - k] = g[0]
            for i in range(n - 2 * k, n + 1):
                d[i] = g[abs(i - n + k)]
        r_back = r[-1]
        if _is_not_one(r_back):
            d = [x * r_back for x in d]
        g_back = g[-1]
        if _is_not_one(g_back):
            d = [x / g_back for x in d]
        r = [rv - dv for rv, dv in zip(r, d)]
        if len(r) > 1:
            n = degree_of(r)
            r = r[:n + 1]
    if n == k:
        r_back, g_back = r[-1], g[-1]
        q[0] = r_back / g_back if _is_not_one(g_back) else r_back
        d = list(g)
        if _is_not_one(r_back):
            d = [x * r_back for x in d]
        if _is_not_one(g_back):
            d = [x / g_back for x in d]
        r = [rv - dv for rv, dv in zip(r, d)]
        if len(r) > 1:
            n = degree_of(r)
            r = r[:n + 1]
    q[0] = q[0] * 2
    return q, r


class ChebyEvaluator:
    """Ciphertext Chebyshev-series evaluation bound to an Evaluator."""

    def __init__(self, ev):
        self.ev = ev

    # -- ciphertext helpers ---------------------------------------------

    def _align(self, a: Ciphertext, level: int) -> Ciphertext:
        while a.level > level:
            a = self.ev.mod_switch(a)
        return a

    def _double_rescale(self, prod: Ciphertext) -> Ciphertext:
        """rescale(prod + prod) — the 2*T_a*T_b step."""
        return self.ev.rescale(self.ev.add(prod, prod))

    def _linear_wsum(self, ciphs, weights) -> Ciphertext:
        """sum_i w_i * c_i with a single trailing rescale
        (Eval_linear_wsum_mutable, ckks_chebyshev.c:243-268)."""
        out = None
        for c, w in zip(ciphs, weights):
            if w == 0.0:
                continue
            t = self.ev.mul_const(c, float(w))
            out = t if out is None else self.ev.add(out, t)
        assert out is not None
        return self.ev.rescale(out)

    def _quot_or_rem(self, t_list, qr, k, is_quotient, in_recursion
                     ) -> Ciphertext:
        """Evaluate a degree<=k quotient/remainder against the baby list
        (Eval_quot_or_rem, ckks_chebyshev.c:281-327)."""
        ev = self.ev
        qr_copy = list(qr[:k]) + [0.0] * max(0, k - len(qr))
        t_k_1 = t_list[k - 1]
        dg = degree_of(qr_copy) if len(qr_copy) > 0 else 0
        if dg > 0:
            out = self._linear_wsum(t_list[:dg], qr_copy[1:dg + 1])
            if is_quotient:
                if in_recursion:
                    quot_last = qr[-1]
                    s = t_k_1
                    for _ in range(int(math.log2(quot_last))):
                        s = ev.add(s, s)
                    out = ev.add(out, s)
                else:
                    out = ev.add(out, t_k_1)
                    out = ev.add(out, t_k_1)
            else:
                out = ev.add(out, t_k_1)
        else:
            if is_quotient:
                quot_last = qr[-1]
                end = int(math.log2(quot_last)) if in_recursion \
                    else int(quot_last)
                out = t_k_1
                for _ in range(end):
                    out = ev.add(out, t_k_1)
            else:
                out = t_k_1
        return ev.add_const(out, qr[0] / 2)

    def _inner(self, coeffs, k, m, t_list, t2_list, in_recursion
               ) -> Ciphertext:
        """Inner_eval_chebyshev_ps (ckks_chebyshev.c:330-427)."""
        ev = self.ev
        k2m2k = k * (1 << (m - 1)) - k
        tkm = [0.0] * (k2m2k + k + 1)
        tkm[-1] = 1.0
        div_q, div_r = long_div_chebyshev(coeffs, tkm)

        r2 = list(div_r)
        if k2m2k <= degree_of(div_r):
            r2[k2m2k] -= 1
            r2 = r2[:degree_of(r2) + 1]
        else:
            r2 = r2 + [0.0] * (k2m2k + 1 - len(r2))
            r2[-1] = -1.0
        divr2_q, divr2_r = long_div_chebyshev(r2, div_q)

        s2_len = max(len(divr2_r), k2m2k + 1)
        s2 = list(divr2_r) + [0.0] * (s2_len - len(divr2_r))
        s2[-1] = 1.0

        t0 = t_list[0]
        dc = degree_of(divr2_q)
        cu = None
        if dc >= 1:
            if dc == 1:
                q1 = divr2_q[1]
                if q1 != 1:
                    cu = ev.rescale(ev.mul_const(t0, q1))
                else:
                    cu = t0
            else:
                cu = self._linear_wsum(t_list[:dc], divr2_q[1:dc + 1])
            cu = ev.add_const(cu, divr2_q[0] / 2)

        if degree_of(div_q) > k:
            qu = self._inner(div_q, k, m - 1, t_list, t2_list, True)
        else:
            qu = self._quot_or_rem(t_list, div_q, k, True, in_recursion)
        if degree_of(s2) > k:
            su = self._inner(s2, k, m - 1, t_list, t2_list, True)
        else:
            su = self._quot_or_rem(t_list, s2, k, False, in_recursion)

        t2m1 = t2_list[m - 1]
        if cu is not None:
            cu = self._align(cu, t2m1.level)
            out = ev.add(t2m1, cu)
        else:
            out = ev.add_const(t2m1, divr2_q[0] / 2)
        out = ev.rescale(ev.mul(out, qu))
        out = ev.add(out, su)
        return out

    # -- public entry ----------------------------------------------------

    def eval_chebyshev(self, ct: Ciphertext, coeffs, a: float = -1.0,
                       b: float = 1.0) -> Ciphertext:
        """Eval_chebyshev_ps (ckks_chebyshev.c:431-587)."""
        ev = self.ev
        coeffs = [float(c) for c in coeffs]
        n = degree_of(coeffs)
        even = is_even_poly(coeffs)
        f2 = list(coeffs[:n + 1] if coeffs[-1] == 0 else coeffs)
        k, m = compute_degree_ps(n)
        if even and k % 2 == 1:
            k += 1

        # baby steps T_1..T_k
        t_list: list[Ciphertext] = [None] * k
        if abs(a + 1) < 1e-10 and abs(b - 1) < 1e-10:
            t_list[0] = ct
        else:
            alpha = 2.0 / (b - a)
            beta = alpha * a
            t0 = ev.rescale(ev.mul_const(ct, alpha))
            t_list[0] = ev.add_const(t0, -1.0 - beta)
        y = t_list[0]
        for i in range(2, k + 1):
            j = i - 1
            if (i & (i - 1)) == 0:  # power of two: T_2a = 2 T_a^2 - 1
                th = t_list[i // 2 - 1]
                tj = self._double_rescale(ev.mul(th, th))
                t_list[j] = ev.add_const(tj, -1.0)
            elif i % 2 == 1:
                if even:
                    continue
                prod = ev.mul(t_list[i // 2 - 1], t_list[i // 2])
                tj = self._double_rescale(prod)
                t_list[j] = ev.sub(tj, self._align(y, tj.level))
            else:
                ih1 = i // 2
                if even and ih1 % 2 == 1:
                    ih1 += 1
                ih2 = i - ih1
                prod = ev.mul(t_list[ih1 - 1], t_list[ih2 - 1])
                tj = self._double_rescale(prod)
                if ih1 == ih2:
                    t_list[j] = ev.add_const(tj, -1.0)
                else:
                    t_list[j] = ev.sub(tj, self._align(t_list[1], tj.level))

        # align all baby steps to T_k's level
        tk_level = t_list[k - 1].level
        for i in range(1, k):
            if even and i % 2 == 1:
                continue
            t_list[i - 1] = self._align(t_list[i - 1], tk_level)

        # giant steps T_{k*2^i}
        t2_list = [t_list[k - 1]]
        for i in range(1, m):
            prod = ev.mul(t2_list[i - 1], t2_list[i - 1])
            t2i = ev.add_const(self._double_rescale(prod), -1.0)
            t2_list.append(t2i)

        # T_{k*(2^m - 1)}
        t2km1 = t2_list[0]
        for i in range(1, m):
            dr = self._double_rescale(ev.mul(t2km1, t2_list[i]))
            t2km1 = ev.sub(dr, self._align(t2_list[0], dr.level))

        k2m2k = k * (1 << (m - 1)) - k
        f2 = f2 + [0.0] * (2 * k2m2k + k + 1 - len(f2))
        f2[-1] = 1.0

        out = self._inner(f2, k, m, t_list, t2_list, False)
        out = ev.sub(out, self._align(t2km1, out.level))
        return out
