"""Ciphertext containers (pytrees with static scale metadata)."""

from __future__ import annotations

import dataclasses

import jax

from ace_tpu.poly.poly import RnsPoly


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Ciphertext:
    c0: RnsPoly
    c1: RnsPoly
    scaling_factor: float
    sf_degree: int
    slots: int

    def tree_flatten(self):
        return ((self.c0, self.c1),
                (self.scaling_factor, self.sf_degree, self.slots))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)

    @property
    def level(self) -> int:
        return self.c0.num_q

    @property
    def num_p(self) -> int:
        return self.c0.num_p


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Ciphertext3:
    """Degree-2 ciphertext (c0, c1, c2) before relinearization."""
    c0: RnsPoly
    c1: RnsPoly
    c2: RnsPoly
    scaling_factor: float
    sf_degree: int
    slots: int

    def tree_flatten(self):
        return ((self.c0, self.c1, self.c2),
                (self.scaling_factor, self.sf_degree, self.slots))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], *aux)

    @property
    def level(self) -> int:
        return self.c0.num_q
