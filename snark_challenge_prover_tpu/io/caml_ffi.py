"""ctypes bridge over the camlsnark_* C ABI (native/caml_ffi.cpp).

The reference exposes its circuit layer to OCaml (Mina/snarky) through
~200 extern "C" entry points per curve (libsnark/caml/caml_mnt4753.cpp).
Our native library serves the same surface for circuit CONSTRUCTION
(protoboard, variables, linear combinations, R1CS systems, Fr/bigint
arithmetic); this module is the loader plus the prove-side adapter: it
walks a natively-built constraint system out through
camlsnark_*_r1cs_constraint_system_iter and rebuilds it as
relations.r1cs objects, so the caml families camlsnark_*_keypair_* /
*_proof_* / *_gm_* / *_bg_* are realised by the TPU proof systems
(proof_systems.groth16_full / gm17 / bg) rather than a host prover.

Usage:
    ffi = CamlFFI("MNT4753")
    pb = ffi.protoboard()
    x = pb.allocate()           # snarky-style witness building
    ...
    cs, primary, aux = pb.extract()
    kp = groth16_full.generator(model, cs, rng)  # device keygen/prove
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "build" / "libcamlsnark.so"

_lib = None
_tried = False

_ITER_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p)


def load():
    """Load (building on demand) the camlsnark library, or None."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("SNARK_TPU_NATIVE", "1") == "0":
        return None
    if not _SO.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "caml"],
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            return None
    try:
        _lib = ctypes.CDLL(str(_SO))
    except OSError:
        _lib = None
    return _lib


class CamlFFI:
    """Per-curve view of the camlsnark_* symbol family."""

    def __init__(self, curve: str = "MNT4753"):
        lib = load()
        if lib is None:
            raise RuntimeError("libcamlsnark.so unavailable")
        self.lib = lib
        self.prefix = f"camlsnark_{curve.lower()}"
        self.curve = curve
        self._sig_cache = {}
        self("init_public_params", restype=None)

    def fn(self, name: str, restype=ctypes.c_void_p, argtypes=None):
        f = getattr(self.lib, f"{self.prefix}_{name}")
        key = name
        if key not in self._sig_cache:
            f.restype = restype
            if argtypes is not None:
                f.argtypes = argtypes
            self._sig_cache[key] = f
        return self._sig_cache[key]

    def __call__(self, name: str, *args, restype=ctypes.c_void_p):
        # Handles travel as ctypes.c_void_p instances (a bare Python int
        # argument would default to 32-bit c_int and truncate pointers);
        # plain ints remain ints (sizes/indices), bytes remain char*.
        res = self.fn(name, restype=restype)(*args)
        if restype is ctypes.c_void_p:
            return ctypes.c_void_p(res)
        return res

    # ---- field / bigint marshalling ------------------------------------
    def field_of_int_value(self, v: int) -> int:
        """Python int -> field element handle (Montgomery Big*)."""
        raw = (v % self.modulus()).to_bytes(96, "little")
        big = self("bigint_r_of_data", raw)
        f = self("bigint_r_to_field", big)
        self("bigint_r_delete", big, restype=None)
        return f

    def field_to_int(self, f) -> int:
        big = self("bigint_r_of_field", f)
        data = self.fn("bigint_r_to_data", restype=ctypes.POINTER(ctypes.c_char))(big)
        v = int.from_bytes(ctypes.string_at(data, 96), "little")
        self("bigint_r_delete", big, restype=None)
        return v

    def modulus(self) -> int:
        if not hasattr(self, "_p"):
            big = self("field_size")
            data = self.fn(
                "bigint_r_to_data", restype=ctypes.POINTER(ctypes.c_char)
            )(big)
            self._p = int.from_bytes(ctypes.string_at(data, 96), "little")
            self("bigint_r_delete", big, restype=None)
        return self._p

    def protoboard(self) -> "CamlProtoboard":
        return CamlProtoboard(self)

    # ---- native string plumbing --------------------------------------
    def read_string(self, handle, delete: bool = True) -> bytes:
        n = self("string_length", handle, restype=ctypes.c_int)
        data = self.fn("string_data",
                       restype=ctypes.POINTER(ctypes.c_char))(handle)
        out = ctypes.string_at(data, n)
        if delete:
            self("string_delete", handle, restype=None)
        return out

    def make_string(self, data: bytes):
        return self.fn(
            "string_of_bytes",
            argtypes=[ctypes.c_char_p, ctypes.c_int],
        )(data, len(data))

    # ---- keypair/proof string serialization (caml_mnt4753.cpp:644-693)
    # The native handles are opaque byte blobs in libsnark's iostream
    # layout; io.caml_serialization encodes/decodes the framework's
    # key/proof objects into that layout.
    def _obj_to_string(self, kind: str, encoded: bytes) -> bytes:
        s = self.make_string(encoded)
        h = self(f"{kind}_of_string", s)
        self("string_delete", s, restype=None)
        out = self(f"{kind}_to_string", h)
        data = self.read_string(out)
        self(f"{kind}_delete", h, restype=None)
        return data

    def proving_key_to_string(self, pk) -> bytes:
        from . import caml_serialization as cs

        return self._obj_to_string(
            "proving_key", cs.proving_key_to_bytes(pk)
        )

    def proving_key_of_string(self, data: bytes):
        from . import caml_serialization as cs

        return cs.proving_key_from_bytes(self.curve, data)

    def verification_key_to_string(self, vk) -> bytes:
        from . import caml_serialization as cs

        return self._obj_to_string(
            "verification_key", cs.verification_key_to_bytes(vk)
        )

    def verification_key_of_string(self, data: bytes):
        from . import caml_serialization as cs

        return cs.verification_key_from_bytes(self.curve, data)

    def proof_to_string(self, proof) -> bytes:
        from . import caml_serialization as cs

        return self._obj_to_string(
            "proof", cs.proof_to_bytes_caml(self.curve, proof)
        )

    def proof_of_string(self, data: bytes):
        from . import caml_serialization as cs

        return cs.proof_from_bytes_caml(self.curve, data)


class CamlProtoboard:
    """snarky-style circuit builder over the native protoboard."""

    def __init__(self, ffi: CamlFFI):
        self.ffi = ffi
        self.pb = ffi("protoboard_create")

    def set_input_sizes(self, n: int):
        self.ffi("protoboard_set_input_sizes", self.pb, n, restype=None)

    def allocate(self):
        """Allocate one variable; returns its Var handle."""
        return self.ffi("protoboard_allocate_variable", self.pb)

    def var_index(self, var) -> int:
        return self.ffi(
            "protoboard_variable_index", var, restype=ctypes.c_int
        )

    def set(self, var, value: int):
        f = self.ffi.field_of_int_value(value)
        self.ffi("protoboard_set_variable", self.pb, var, f, restype=None)
        self.ffi("field_delete", f, restype=None)

    def get(self, var) -> int:
        f = self.ffi("protoboard_get_variable", self.pb, var)
        v = self.ffi.field_to_int(f)
        self.ffi("field_delete", f, restype=None)
        return v

    def lc(self, terms):
        """[(coeff int, var_handle_or_index)] -> LinComb handle.

        An int var denotes a wire index (0 = the constant one), matching
        camlsnark_*_var_create semantics."""
        out = self.ffi("linear_combination_create")
        for coeff, var in terms:
            f = self.ffi.field_of_int_value(coeff)
            is_idx = isinstance(var, int)
            v = self.ffi("var_create", var) if is_idx else var
            self.ffi("linear_combination_add_term", out, f, v, restype=None)
            self.ffi("field_delete", f, restype=None)
            if is_idx:
                self.ffi("var_delete", v, restype=None)
        return out

    def add_constraint(self, a, b, c):
        con = self.ffi("r1cs_constraint_create", a, b, c)
        self.ffi("protoboard_add_r1cs_constraint", self.pb, con, restype=None)
        self.ffi("r1cs_constraint_delete", con, restype=None)

    def num_variables(self) -> int:
        return self.ffi(
            "protoboard_num_variables", self.pb, restype=ctypes.c_int
        )

    # ---- extraction into the TPU framework -----------------------------
    def extract(self):
        """-> (relations.r1cs.R1CSConstraintSystem, primary, auxiliary)."""
        from ..relations.r1cs import (
            LinearCombination,
            R1CSConstraint,
            R1CSConstraintSystem,
        )

        ffi = self.ffi
        sys_h = ffi("protoboard_constraint_system", self.pb)
        primary_n = ffi(
            "r1cs_constraint_system_get_primary_input_size",
            sys_h, restype=ctypes.c_size_t,
        )
        aux_n = ffi(
            "r1cs_constraint_system_get_auxiliary_input_size",
            sys_h, restype=ctypes.c_size_t,
        )

        constraints = []

        def lc_of(handle):
            terms_h = ffi("linear_combination_terms", handle)
            n = ffi(
                "linear_combination_term_vector_length",
                terms_h, restype=ctypes.c_int,
            )
            terms = []
            for i in range(n):
                t = ffi("linear_combination_term_vector_get", terms_h, i)
                idx = ffi(
                    "linear_combination_term_index", t, restype=ctypes.c_int
                )
                coeff_h = ffi("linear_combination_term_coeff", t)
                coeff = ffi.field_to_int(coeff_h)
                ffi("field_delete", coeff_h, restype=None)
                ffi("linear_combination_term_delete", t, restype=None)
                terms.append((idx, coeff))
            ffi("linear_combination_term_vector_delete", terms_h, restype=None)
            return LinearCombination(terms)

        @_ITER_CB
        def on_constraint(con_ptr):
            con = ctypes.c_void_p(con_ptr)
            a_h = ffi("r1cs_constraint_a", con)
            b_h = ffi("r1cs_constraint_b", con)
            c_h = ffi("r1cs_constraint_c", con)
            constraints.append(
                R1CSConstraint(a=lc_of(a_h), b=lc_of(b_h), c=lc_of(c_h))
            )
            for h in (a_h, b_h, c_h):
                ffi("linear_combination_delete", h, restype=None)

        ffi.fn(
            "r1cs_constraint_system_iter",
            restype=None,
            argtypes=[ctypes.c_void_p, _ITER_CB],
        )(sys_h, on_constraint)
        ffi("r1cs_constraint_system_delete", sys_h, restype=None)

        cs = R1CSConstraintSystem(
            ffi.modulus(),
            primary_input_size=primary_n,
            auxiliary_input_size=aux_n,
        )
        for c in constraints:
            cs.add_constraint(c)

        def fv_to_list(name):
            h = ffi(name, self.pb)
            n = ffi("field_vector_length", h, restype=ctypes.c_int)
            out = []
            for i in range(n):
                f = ffi("field_vector_get", h, i)
                out.append(ffi.field_to_int(f))
                ffi("field_delete", f, restype=None)
            ffi("field_vector_delete", h, restype=None)
            return out

        primary = fv_to_list("protoboard_primary_input")
        auxiliary = fv_to_list("protoboard_auxiliary_input")
        return cs, primary, auxiliary

    def digest(self) -> bytes:
        """MD5 constraint-system digest (caml_mnt4753.cpp:507-524 layout)."""
        ffi = self.ffi
        sys_h = ffi("protoboard_constraint_system", self.pb)
        s = ffi("r1cs_constraint_system_digest", sys_h)
        out = ffi.read_string(s)
        ffi("r1cs_constraint_system_delete", sys_h, restype=None)
        return out
