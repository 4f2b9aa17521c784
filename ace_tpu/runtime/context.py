"""Runtime context: one-stop setup/teardown for encrypted inference.

TPU-native analog of the reference's rtlib context layer
(fhe-cmplr/rtlib/ant/src/rtlib/context.c Prepare_context:29-86,
Finalize_context:88-138) plus the io_api client/server split
(common/include/io_api.h:21-38): the *client* holds the secret key and
does encode/encrypt/decrypt on the host; the *server* holds only
evaluation keys and runs the encrypted graph on the device. In-process
the boundary is the same indirection the reference uses, designed so
cipher exchange can become RPC later.
"""

from __future__ import annotations

import numpy as np

from ace_tpu.ckks.params import CkksParams
from ace_tpu.runtime.timing import TIMING


class FheContext:
    """Prepare params -> keys -> encoder/evaluator (+ bootstrap)."""

    def __init__(self, params: CkksParams = None, *, scheme_info=None,
                 seed: int = 0, bootstrap_slots: tuple = (),
                 level_budget=(3, 3), max_rot_keys: int = 0,
                 rot_key_budget_bytes: int = 0, mesh=None,
                 digit_mesh=None):
        """mesh: limb-sharded residency for keys/plaintexts (put_limb).
        digit_mesh: a ('digit','slot') Mesh routing key-switches through
        the SPMD evaluator (parallel/spmd_eval.py) with per-digit key
        residency."""
        from ace_tpu.ckks.encoder import Encoder
        from ace_tpu.ckks.keygen import KeyGenerator
        from ace_tpu.ckks.evaluator import Evaluator

        if params is None:
            si = scheme_info
            params = CkksParams(
                degree=si.poly_degree, num_q=si.mul_level + 1,
                first_mod_size=si.first_mod_size,
                scaling_mod_size=si.scaling_mod_size,
                hamming_weight=si.hamming_weight,
                num_q_parts=si.q_part_num)
        self.params = params
        if rot_key_budget_bytes and not max_rot_keys:
            # size the rotation-key LRU from the ACTUAL per-key bytes of
            # the key structure (not a hand formula), context.c:100-107
            from ace_tpu.ckks.keygen import switch_key_nbytes
            max_rot_keys = max(
                16, rot_key_budget_bytes // switch_key_nbytes(params))
        with TIMING.tm("RTM_PREPARE_CONTEXT"):
            self.encoder = Encoder(params)
            self.encoder.mesh = mesh
            from ace_tpu.utils.csprng import Blake2Csprng
            self.keygen = KeyGenerator(params, Blake2Csprng(seed),
                                       max_rot_keys=max_rot_keys, mesh=mesh)
            if digit_mesh is not None:
                from ace_tpu.parallel.spmd_eval import SpmdEvaluator
                self.evaluator = SpmdEvaluator(params, self.keygen,
                                               self.encoder, digit_mesh)
            else:
                self.evaluator = Evaluator(params, self.keygen,
                                           self.encoder)
            self.evaluator.mesh = mesh
            self._bts = {}
            for slots in bootstrap_slots:
                self.bootstrap_precom(slots, level_budget)
        self.pt_mgr = None
        self._io_inputs: dict[str, object] = {}
        self._io_outputs: dict[str, object] = {}

    def hbm_plan(self) -> str:
        """Static HBM budget report, printed at startup (the analog of
        the reference's key/weight memory report, rtlib context.c:
        100-116) — the ahead-of-time answer to 'will this fit', in
        place of reactive OOM-retry."""
        import os
        from ace_tpu.ckks.keygen import switch_key_nbytes
        p = self.params
        n = p.degree
        L = p.crt.num_q
        K = p.crt.num_p
        key_b = switch_key_nbytes(p)
        n_keys = self.keygen.max_rot_keys or 0
        keys = n_keys * key_b
        msg_budget = self.encoder._msg_cache_budget
        pt_budget = self.encoder._pt_cache_budget
        bundle = int(os.environ.get("ACE_TPU_MAX_BUNDLE_MSG", "12"))
        # peak bundle workspace: R keyswitch exts (2 polys, L+K limbs)
        # + R key digit planes + one group's MAC transients
        row = (L + K) * n * 8
        exts = bundle * 2 * row
        kdig = bundle * 2 * p.crt.num_decomp(L) * row
        work = exts + kdig + 4 * row
        total = keys + msg_budget + pt_budget + work
        return ("[RT_STAT] HBM plan: rot-keys %d x %.0f MB = %.2f GB, "
                "msg-cache %.1f GB, pt-cache %.1f GB, bundle workspace "
                "%.2f GB (R<=%d at L=%d) -> planned peak %.2f GB "
                "(+ live ciphertexts)"
                % (n_keys, key_b / 2**20, keys / 2**30,
                   msg_budget / 2**30, pt_budget / 2**30,
                   work / 2**30, bundle, L, total / 2**30))

    @classmethod
    def from_manifest(cls, path: str, **kw) -> "FheContext":
        """Rebuild a runtime context from a compile-driver manifest
        (the analog of the generated Get_context_params consumed by
        Prepare_context — eg_fhertlib_add.inc:15-24, context.c:29-86).

        Restores the scheme parameters, opens the weight file if the
        manifest names one, and pre-warms the rotation-key LRU with the
        manifest's rotation inventory (up to the LRU capacity)."""
        import json
        from ace_tpu.compiler.scheme_info import SchemeInfo
        with open(path) as f:
            m = json.load(f)
        s = dict(m["scheme"])
        s["rotate_indices"] = tuple(s.get("rotate_indices", ()))
        ctx = cls(scheme_info=SchemeInfo(**s), **kw)
        ctx.manifest = m
        wf = m.get("weights_file")
        if wf:
            import os
            if not os.path.isabs(wf):
                wf = os.path.join(os.path.dirname(os.path.abspath(path)),
                                  wf)
            if os.path.exists(wf):
                ctx.open_weight_file(wf)
        rots = m.get("rotate_indices", [])
        cap = ctx.keygen.max_rot_keys or len(rots)
        for r in rots[:cap]:
            if r:
                ctx.keygen.rot_key(int(r))
        return ctx

    # -- bootstrap precompute (context.c:162-185) -----------------------

    def bootstrap_precom(self, slots: int = 0, level_budget=(3, 3)):
        from ace_tpu.ckks.bootstrap import BootstrapContext
        slots = slots or self.params.degree // 2
        if slots not in self._bts:
            with TIMING.tm("RTM_BS_SETUP"):
                self._bts[slots] = BootstrapContext(
                    self.evaluator, slots, level_budget)
        return self._bts[slots]

    def bootstrap(self, ct, raise_level: int = 0):
        """Bootstrap with lazy per-slot-count precompute
        (cipher_eval.c:366-380)."""
        with TIMING.tm("RTM_BOOTSTRAP"):
            return self.bootstrap_precom(ct.slots).bootstrap(ct, raise_level)

    # -- weight manager ---------------------------------------------------

    def open_weight_file(self, path: str):
        from ace_tpu.runtime.rt_data import RtDataReader, PtManager
        self.pt_mgr = PtManager(RtDataReader(path), self.encoder,
                                path=path)
        return self.pt_mgr

    # -- client side (io_api): encode/encrypt/decrypt --------------------

    def prepare_input(self, tensor: np.ndarray, name: str,
                      level: int = 0):
        """Encode+encrypt an input tensor and post it to the server-side
        input queue (Prepare_input + Io_set_input). `level` 0 encrypts
        at the top of the chain; a graph whose first bootstrap comes
        after `s` rescales only needs level s+1 (scheme_info.input_level),
        which shrinks every pre-bootstrap program by ~num_q/level."""
        with TIMING.tm("RTM_ENCODE_ARRAY"):
            flat = np.asarray(tensor, dtype=np.float64).reshape(-1)
            slots = self.params.degree // 2
            msg = np.zeros(slots, dtype=np.complex128)
            msg[:flat.size] = flat
            pt = self.encoder.encode(msg, level=level)
        ct = self.evaluator.encrypt(pt)
        self._io_inputs[name] = ct
        return ct

    def get_input_data(self, name: str):
        """Server-side fetch (Get_input_data)."""
        return self._io_inputs[name]

    def set_output_data(self, name: str, ct):
        """Server-side post (Set_output_data)."""
        self._io_outputs[name] = ct

    def handle_output(self, name: str, length: int = 0) -> np.ndarray:
        """Client-side decrypt+decode (Handle_output).

        Residual limbs above ~3 are dropped first (exact mod-switch:
        message + noise << the remaining modulus), so the exact-CRT
        big-int decode costs the same whether the graph ended 2 or 25
        levels above the floor — on a shared max-depth chain (zoo) a
        high-level decode was minutes of host big-int work."""
        ct = self._io_outputs[name]
        floor = 3 if ct.sf_degree <= 1 else 2 + 2 * ct.sf_degree
        while ct.level > floor:
            ct = self.evaluator.mod_switch(ct)
        pt = self.evaluator.decrypt(ct)
        return self.encoder.decode(pt, length).real

    # -- reporting (Finalize_context) -------------------------------------

    def key_memory_bytes(self) -> int:
        """Total evaluation-key device memory (context.c:100-107)."""
        total = 0
        for key in self.keygen.all_keys():
            for kp in (key.b, key.a):
                for p in (kp if isinstance(kp, (list, tuple)) else [kp]):
                    total += p.data.size * p.data.dtype.itemsize
        return total

    def finalize(self) -> str:
        with TIMING.tm("RTM_FINALIZE_CONTEXT"):
            report = ["[RT_STAT] key memory: %.1f MB"
                      % (self.key_memory_bytes() / 2**20)]
            report.append(TIMING.report())
        return "\n".join(report)
