"""The "rel" (relative-rotation) hash implementation is bit-identical to
the direct "var" form for every hasher kind / k / seed / strand.

Identity: with u[i] = rotl(vals[i], (i + rot) % 32) the reference's
rolling ntHash (bench/src/nthash.rs) is h[i] = rotr(xor_{j<k} u[i+j],
i % 32) = rotl(xor_{j<k} rotl(vals[i+j], j), rot) — the per-element
rotation cancels inside the window, leaving one STATIC rotation per
doubling stage and a final constant rotation that folds into the table
scalars. Same for the reverse-complement arm with rotr and k-1+rot.
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from simd_minimizers_tpu.hashers import MulHasher, NtHasher
from simd_minimizers_tpu.ops import fused as F
from simd_minimizers_tpu.ops.pipeline import hasher_jit_args


@pytest.mark.parametrize(
    "kind,canonical,k,rot",
    [
        ("nt", True, 21, 0),
        ("nt", False, 21, 0),
        ("nt", True, 5, 0),
        ("nt", True, 31, 7),
        ("nt", True, 1, 3),
        ("nt", True, 64, 13),
        ("nt", False, 33, 31),
        ("mul", True, 21, 0),
        ("mul", False, 19, 5),
        ("mul", True, 33, 11),
    ],
)
def test_rel_matches_var(kind, canonical, k, rot):
    rng = np.random.default_rng(k * 131 + rot)
    hasher = (NtHasher if kind == "nt" else MulHasher)(k, canonical=canonical)
    _, table, mul_const = hasher_jit_args(hasher)
    SP = 300
    M = jnp.asarray(rng.integers(0, 4, (8, SP), dtype=np.uint32))
    tab = [jnp.uint32(t) for t in table]
    mulc = jnp.uint32(mul_const)
    nkc = SP - k + 1

    prev = F.HASH_IMPL
    try:
        F.HASH_IMPL = "var"
        a = F._hash_windows(M, kind, canonical, rot, k, tab, mulc, nkc)
        F.HASH_IMPL = "rel"
        b = F._hash_windows(M, kind, canonical, rot, k, tab, mulc, nkc)
    finally:
        F.HASH_IMPL = prev
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_antilex_ignores_impl():
    # the antilex path has no rotations; both impl flags share one code path
    rng = np.random.default_rng(0)
    M = jnp.asarray(rng.integers(0, 4, (8, 64), dtype=np.uint32))
    prev = F.HASH_IMPL
    try:
        F.HASH_IMPL = "var"
        a = F._hash_windows(M, "antilex", True, 0, 9, None, None, 50)
        F.HASH_IMPL = "rel"
        b = F._hash_windows(M, "antilex", True, 0, 9, None, None, 50)
    finally:
        F.HASH_IMPL = prev
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
