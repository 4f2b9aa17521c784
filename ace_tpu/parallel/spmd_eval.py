"""Evaluator with the digit×slot SPMD key-switch wired into the model
path (SURVEY.md §5.8; the integration the round-2 review asked for).

`SpmdEvaluator` is a drop-in `Evaluator`: ops whose level matches the
mesh's digit axis route key-switches through `parallel.spmd` —
per-digit MACs psum'd over 'digit', slot-sharded 4-step NTTs with
all_to_all transposes over 'slot', and per-digit rotation-key
residency (each digit row holds 1/D of every switching key). All other
ops (and non-matching levels, where the hybrid decomposition has a
different digit count) fall back to the single-device bundles — the
two paths are bit-exact, so mixing them is sound.

Reference capability matched: the 34.5 GB rotation-key residency that
motivates multi-chip (rtlib context.c:100-107) — here keys shard D·s
ways instead of LRU-evicting."""

from __future__ import annotations

from ace_tpu.ckks.evaluator import Evaluator
from ace_tpu.parallel.spmd import SpmdKeySwitch


class SpmdEvaluator(Evaluator):
    def __init__(self, params, keygen, encoder, digit_mesh):
        super().__init__(params, keygen, encoder)
        self.digit_mesh = digit_mesh
        self._spmd: dict[int, SpmdKeySwitch | None] = {}

    def _ksw(self, level: int) -> SpmdKeySwitch | None:
        """SPMD key-switch for `level`, if the mesh digit axis matches
        the live q-part count there (else None -> fallback)."""
        if level not in self._spmd:
            crt = self.crt
            ok = (level >= crt.per_part_size
                  and crt.num_decomp(level)
                  == self.digit_mesh.shape["digit"]
                  and self.params.degree
                  >= 2 * self.digit_mesh.shape["slot"] * 128)
            self._spmd[level] = (SpmdKeySwitch(
                self.params, level, self.digit_mesh) if ok else None)
        return self._spmd[level]

    def rotate(self, a, rotation: int):
        if rotation == 0:
            return a
        k = self._ksw(a.level)
        if k is None:
            return super().rotate(a, rotation)
        return k.rotate(a, rotation, self.keygen)

    def mul(self, a, b):
        a, b = self._adjust(a, b)
        k = self._ksw(a.level)
        if k is None:
            return super().mul(a, b)
        return k.relinearize(self.mul3(a, b), self.keygen)

    def relinearize(self, c3):
        k = self._ksw(c3.c2.num_q)
        if k is None:
            return super().relinearize(c3)
        return k.relinearize(c3, self.keygen)

    def key_residency_report(self) -> str:
        per_dev = sum(k.key_memory_resident_bytes()
                      for k in self._spmd.values() if k is not None)
        d = self.digit_mesh.shape["digit"]
        s = self.digit_mesh.shape["slot"]
        return (f"[RT_STAT] spmd key residency: {per_dev / 2**20:.1f} "
                f"MB/device over digit={d} x slot={s}")
