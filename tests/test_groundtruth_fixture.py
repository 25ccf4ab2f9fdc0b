"""Re-certification hook for hash parity against the real `seq-hash` crate.

The reference does not vendor `seq-hash` (/root/reference/src/lib.rs:164-165
re-export; Cargo.lock pin only), so this repo's NT hash table was
RECONSTRUCTED from the only literal vectors the reference publishes — the
k=5, w=7 doc-tests (/root/reference/src/lib.rs:92-140). The reconstruction
reproduces all published vectors (tests/test_golden.py), but bit-exactness
at other k against the real crate is an inference, not a verified fact
(see PARITY.md "Known risk" and hashers/__init__.py).

This test closes the loop when ground truth becomes available: run
`tools/gen_groundtruth.rs` against the real crate on any networked
machine (copy-paste recipe in its header: cargo new + cargo add
simd-minimizers@3 + cargo run --release > groundtruth.json), drop the
output at tests/groundtruth.json, and the whole framework is
re-certified against it — k in {5, 21, 31, 63}, all three hashers,
forward + canonical, seeded variants.

Fixture format (emitted by tools/gen_groundtruth.rs):

    {"cases": [
       {"seq": "ACGT...",          // ASCII ACGT
        "k": 21, "w": 11,
        "hasher": "nt",            // nt | mul | antilex
        "canonical": true,
        "seed": null,              // or an integer for new_with_seed
        "positions": [0, 7, ...]}  // expected u32 positions
    ]}
"""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "groundtruth.json")


def test_groundtruth_required_flag():
    """CI tripwire: with SMTPU_REQUIRE_GROUNDTRUTH=1 a missing fixture is
    a LOUD FAILURE, not a skip — any future networked run that can
    generate ground truth (tools/gen_groundtruth.rs) must not silently
    forget to. Unset, the absence stays a documented skip."""
    if not os.environ.get("SMTPU_REQUIRE_GROUNDTRUTH"):
        pytest.skip("SMTPU_REQUIRE_GROUNDTRUTH not set")
    assert os.path.exists(FIXTURE), (
        "SMTPU_REQUIRE_GROUNDTRUTH=1 but tests/groundtruth.json is absent: "
        "generate it with tools/gen_groundtruth.rs against the real "
        "simd-minimizers crate (recipe in its header), then re-run. The "
        "'bit-identical' claims rest on a k=5 reconstruction until then."
    )


@pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="no ground-truth fixture present (generate one with the Rust "
    "crate on a networked machine; see module docstring)",
)
def test_groundtruth_fixture():
    from simd_minimizers_tpu.hashers import AntiLexHasher, MulHasher, NtHasher
    from simd_minimizers_tpu.ops import backend, oracle
    from simd_minimizers_tpu.seq.packed import AsciiSeq

    classes = {"nt": NtHasher, "mul": MulHasher, "antilex": AntiLexHasher}
    with open(FIXTURE) as f:
        fixture = json.load(f)
    assert fixture["cases"], "empty fixture"
    for i, case in enumerate(fixture["cases"]):
        k, w = case["k"], case["w"]
        h = classes[case["hasher"]](
            k, canonical=case["canonical"], seed=case.get("seed")
        )
        codes = AsciiSeq(case["seq"].encode()).codes()
        want = np.asarray(case["positions"], np.uint32)
        got_oracle = oracle.collect_and_dedup(
            oracle.selected_stream(codes, k, w, h))
        np.testing.assert_array_equal(got_oracle, want, err_msg=f"case {i} (oracle)")
        got_fast = backend.sketch(codes, k, w, h)
        np.testing.assert_array_equal(got_fast, want, err_msg=f"case {i} (backend)")
