"""CKKS encoder/decoder: canonical embedding with power-of-5 rot group.

Host-side (client) numpy implementation replicating the reference
(fhe-cmplr/rtlib/ant/src/util/ckks_encoder.c Encode_impl 64-bit path,
Decode; ntt.c:585-753 Embedding/Embedding_inv with fft_length = 2N).

Rounding convention matches exactly: llround(x*Delta + 0.5) (ties away
from zero) and signed residues taken canonically mod each prime. Decode
reconstructs coefficients exactly with Python big ints (centered lift
mod Q_level) before the float divide — so decode precision is limited
only by the final double ops, as in the reference.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from ace_tpu.ckks.params import CkksParams
from ace_tpu.ops import modops
from ace_tpu.poly import poly as P
from ace_tpu.poly.poly import RnsPoly


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Plaintext:
    poly: RnsPoly
    scaling_factor: float
    sf_degree: int
    slots: int

    def tree_flatten(self):
        return (self.poly,), (self.scaling_factor, self.sf_degree, self.slots)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def level(self) -> int:
        return self.poly.num_q


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class Encoder:
    def __init__(self, params: CkksParams):
        self.params = params
        n = params.degree
        self.fft_length = 2 * n
        num_slots = self.fft_length // 4  # = N/2
        self.rot_group = np.empty(num_slots, dtype=np.int64)
        self.rot_group[0] = 1
        for i in range(1, num_slots):
            self.rot_group[i] = (5 * self.rot_group[i - 1]) % self.fft_length
        ang = 2 * np.pi * np.arange(self.fft_length) / self.fft_length
        self.rou = np.cos(ang) + 1j * np.sin(ang)

    # -- special FFT (ntt.c:678-753) ------------------------------------

    def embedding(self, vals: np.ndarray) -> np.ndarray:
        """Slot values from coefficient-side values (decode direction)."""
        n = len(vals)
        d = np.asarray(vals, dtype=np.complex128)[_bit_reverse_perm(n)]
        logn = n.bit_length() - 1
        for logm in range(1, logn + 1):
            idx_mod = 1 << (logm + 2)
            gap = self.fft_length // idx_mod
            m = 1 << logm
            num = m // 2
            d = d.reshape(n // m, m)
            rou_idx = (self.rot_group[:num] % idx_mod) * gap
            w = self.rou[rou_idx]
            even = d[:, :num]
            odd = d[:, num:] * w[None, :]
            d = np.concatenate([even + odd, even - odd], axis=1)
        return d.reshape(n)

    def embedding_inv(self, vals: np.ndarray) -> np.ndarray:
        """Coefficient-side values from slot values (encode direction)."""
        n = len(vals)
        d = np.asarray(vals, dtype=np.complex128).copy()
        logn = n.bit_length() - 1
        for logm in range(logn, 0, -1):
            idx_mod = 1 << (logm + 2)
            gap = self.fft_length // idx_mod
            m = 1 << logm
            num = m // 2
            d = d.reshape(n // m, m)
            rou_idx = (idx_mod - (self.rot_group[:num] % idx_mod)) * gap
            w = self.rou[rou_idx]
            plus = d[:, :num] + d[:, num:]
            minus = (d[:, :num] - d[:, num:]) * w[None, :]
            d = np.concatenate([plus, minus], axis=1)
        d = d.reshape(n)[_bit_reverse_perm(n)]
        return d / n

    # -- encode / decode -------------------------------------------------

    def encode(self, values, level: int = 0, slots: int = 0,
               sf_degree: int = 1, extended: bool = False) -> Plaintext:
        """Encode complex slot values at (level, scale^sf_degree).

        Replicates Encode_impl (ckks_encoder.c:199-300): embedding_inv,
        llround(x*Delta + 0.5), slot->coefficient interleave with
        gap = N/(2*slots), RNS transform, optional Delta^(sf_degree-1)
        multiply, final NTT.

        extended: also carry residues over the P primes, so the
        plaintext can multiply extended-basis (QP) ciphertexts inside
        hoisted rotation accumulations (the reference encodes weights
        per-level the same way for its ext BSGS loops).
        """
        params = self.params
        crt = params.crt
        n = params.degree
        slots = slots or n // 2
        level = level or crt.num_q
        values = np.asarray(values, dtype=np.complex128)
        assert len(values) <= slots <= n // 2
        if len(values) < slots:
            values = np.concatenate(
                [values, np.zeros(slots - len(values), np.complex128)])

        to_scale = self.embedding_inv(values)
        delta = params.scaling_factor
        gap = n // (slots * 2)
        message = [0] * n
        for i in range(slots):
            sr = to_scale[i].real * delta + 0.5
            si = to_scale[i].imag * delta + 0.5
            # llround: nearest, ties away from zero
            message[i * gap] = int(math.floor(sr + 0.5)) if sr >= 0 \
                else -int(math.floor(-sr + 0.5))
            message[(i + slots) * gap] = int(math.floor(si + 0.5)) if si >= 0 \
                else -int(math.floor(-si + 0.5))

        primes = crt.q_primes[:level] + (crt.p_primes if extended else [])
        data = np.stack([
            modops.np_u64([c % q for c in message])
            for q in primes])
        p = RnsPoly(jnp.asarray(data), level,
                    crt.num_p if extended else 0, False)
        if sf_degree > 1:
            idelta = int(delta)
            p = P.mul_scalars(
                p, [pow(idelta, sf_degree - 1, q) for q in primes], crt)
        p = P.to_ntt(p, crt)
        return Plaintext(p, delta ** sf_degree, sf_degree, slots)

    def encode_value(self, value: float, level: int,
                     sf_degree: int = 1) -> Plaintext:
        """Encode a broadcast scalar (Encode_val_at_level)."""
        slots = self.params.degree // 2
        return self.encode(np.full(slots, value, np.complex128), level,
                           slots, sf_degree)

    def encode_value_with_scale(self, value: float, level: int,
                                scale: float) -> Plaintext:
        """Encode scalar at an explicit scale (Encode_val_at_level_with_scale
        -> Encode_impl_with_scale). Used by upscale: coefficients are
        llround(x*scale + 0.5) without the Delta^k structure."""
        crt = self.params.crt
        n = self.params.degree
        slots = n // 2
        values = np.full(slots, value, np.complex128)
        to_scale = self.embedding_inv(values)
        gap = 1
        message = [0] * n
        for i in range(slots):
            sr = to_scale[i].real * scale + 0.5
            si = to_scale[i].imag * scale + 0.5
            message[i * gap] = int(math.floor(sr + 0.5)) if sr >= 0 \
                else -int(math.floor(-sr + 0.5))
            message[(i + slots) * gap] = int(math.floor(si + 0.5)) if si >= 0 \
                else -int(math.floor(-si + 0.5))
        data = np.stack([
            modops.np_u64([c % q for c in message])
            for q in crt.q_primes[:level]])
        p = P.to_ntt(RnsPoly(jnp.asarray(data), level, 0, False), crt)
        return Plaintext(p, scale, 1, slots)

    def decode(self, plain: Plaintext, length: int = 0) -> np.ndarray:
        """Exact CRT reconstruction + embedding (ckks_encoder.c:649-703)."""
        crt = self.params.crt
        poly = plain.poly
        if poly.is_ntt:
            poly = P.from_ntt(poly, self.params.crt)
        level = poly.num_q
        n = poly.degree
        slots = plain.slots
        gap = (n // 2) // slots
        qs = crt.q_primes[:level]
        Q = 1
        for q in qs:
            Q *= q
        hats = [Q // q for q in qs]
        hat_invs = [pow(h % q, -1, q) for h, q in zip(hats, qs)]
        data = np.asarray(poly.data)
        half_q = Q // 2
        msg = np.empty(slots, dtype=np.complex128)
        for i in range(slots):
            vals = []
            for idx in (i * gap, i * gap + n // 2):
                acc = 0
                for l in range(level):
                    acc += (int(data[l, idx]) * hat_invs[l] % qs[l]) * hats[l]
                acc %= Q
                if acc > half_q:
                    acc -= Q
                vals.append(float(acc))
            msg[i] = complex(vals[0] / plain.scaling_factor,
                             vals[1] / plain.scaling_factor)
        res = self.embedding(msg)
        return res[:length] if length else res
