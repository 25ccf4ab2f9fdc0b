"""Procedural device-resident genome (bench/paper.py): the formula-built
row-striped words must be bit-identical to the native packer over the
same chars, at zero and non-zero global offsets — this is what makes the
multi-call 3.1 Gbp bench a well-defined single sequence whose seam-merged
count equals the single-call answer."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench"))


def test_procedural_genome_matches_native_pack():
    import jax.numpy as jnp
    import paper

    from simd_minimizers_tpu.ops import fused as F

    k, w = 21, 11
    l = k + w - 1
    C = F.DEF_C
    PADH = F.padh_for(l)
    _, SPW, SPW_PAD = F.rowstriped_geometry(C, PADH)
    for g, s in [(1, 0), (2, 65536), (1, 131056)]:  # incl. non-16-aligned row math
        need = F.rowstriped_need_chars(g, C, PADH)
        codes = paper.proc_codes(s, s + need + 64)
        want = F.pack_rowstriped(codes, g, C, PADH)
        got = np.asarray(paper.proc_gen_striped(
            jnp.uint32(s), g=g, C=C, SPW=SPW, SPW_PAD=SPW_PAD))
        np.testing.assert_array_equal(got, want)


def test_proc_h2c_jnp_numpy_identical():
    import jax.numpy as jnp
    import paper

    idx = np.arange(100000, dtype=np.uint32) * np.uint32(2654435761)
    a = paper.proc_h2c(idx)
    b = np.asarray(paper.proc_h2c(jnp.asarray(idx)))
    np.testing.assert_array_equal(a, b)
    # density sanity: all four chars occur with ~equal frequency
    counts = np.bincount(a, minlength=4)
    assert counts.min() > 0.24 * idx.size
