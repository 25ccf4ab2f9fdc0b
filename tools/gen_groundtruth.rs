//! Ground-truth fixture generator for hash-parity re-certification.
//!
//! This repo's NT/antilex hash tables were RECONSTRUCTED from the only
//! literal vectors the reference publishes (its k=5, w=7 doc-tests); see
//! tests/test_groundtruth_fixture.py and PARITY.md "Known risk". Running
//! this program against the real crates on any NETWORKED machine emits
//! `tests/groundtruth.json`; drop that file into this repo's `tests/`
//! directory and the skip-if-absent test re-certifies every hasher at
//! k ∈ {5, 21, 31, 63} (including the benchmark configs) bit-exactly.
//!
//! How to run (no file edits needed):
//!
//! ```sh
//! cargo new gen-groundtruth && cd gen-groundtruth
//! cargo add simd-minimizers@3        # pulls seq-hash + packed-seq pins
//! cp /path/to/this/gen_groundtruth.rs src/main.rs
//! cargo run --release > groundtruth.json
//! cp groundtruth.json <repo>/tests/groundtruth.json
//! ```
//!
//! Or as a single-file cargo script (nightly): `cargo -Zscript run` after
//! prepending the manifest block:
//!
//! ```toml
//! ---
//! [dependencies]
//! simd-minimizers = "3"
//! ---
//! ```
//!
//! Output format (consumed by tests/test_groundtruth_fixture.py):
//! {"cases": [{"seq": "ACGT...", "k": 21, "w": 11, "hasher": "nt",
//!             "canonical": true, "seed": null, "positions": [..]}]}

// API re-checked against the reference v3.0.0 (2026-08-19): `seq_hash`
// and `packed_seq` are re-exported at src/lib.rs:165-167; the hasher
// names match src/test.rs:6 (`use seq_hash::{AntiLexHasher, MulHasher,
// NtHasher}`); `new_with_seed` per src/lib.rs:157 and `run_once`
// returning Vec<u32> per src/lib.rs:364-368.
use simd_minimizers::seq_hash::{AntiLexHasher, MulHasher, NtHasher};
use simd_minimizers::packed_seq::{PackedSeqVec, SeqVec};
use simd_minimizers::{canonical_minimizers, minimizers};

/// Deterministic sequence so the fixture is reproducible without rand.
fn make_seq(n: usize, mut state: u64) -> String {
    let mut out = String::with_capacity(n);
    for _ in 0..n {
        // splitmix64 step
        state = state.wrapping_add(0x9E3779B97F4A7C15);
        let mut z = state;
        z = (z ^ (z >> 30)).wrapping_mul(0xBF58476D1CE4E5B9);
        z = (z ^ (z >> 27)).wrapping_mul(0x94D049BB133111EB);
        z ^= z >> 31;
        out.push(b"ACGT"[(z % 4) as usize] as char);
    }
    out
}

fn emit_case(
    out: &mut Vec<String>,
    seq: &str,
    k: usize,
    w: usize,
    hasher: &str,
    canonical: bool,
    seed: Option<u64>,
    positions: Vec<u32>,
) {
    let pos_json = positions
        .iter()
        .map(|p| p.to_string())
        .collect::<Vec<_>>()
        .join(",");
    let seed_json = seed.map_or("null".to_string(), |s| s.to_string());
    out.push(format!(
        "{{\"seq\":\"{seq}\",\"k\":{k},\"w\":{w},\"hasher\":\"{hasher}\",\
         \"canonical\":{canonical},\"seed\":{seed_json},\"positions\":[{pos_json}]}}"
    ));
}

fn main() {
    let seq = make_seq(10_000, 0xD15EA5E);
    let packed = PackedSeqVec::from_ascii(seq.as_bytes());
    let ps = packed.as_slice();
    let mut cases: Vec<String> = vec![];

    // k sweep covers the doc-test config (5), both benchmark configs
    // (21/11, 31/5-adjacent), and the u128-value regime (63). w odd so
    // l = k + w - 1 stays odd for the canonical strand rule.
    for &(k, w) in &[(5usize, 7usize), (21, 11), (31, 7), (63, 11)] {
        // unseeded, forward + canonical, all three hashers
        emit_case(&mut cases, &seq, k, w, "nt", false, None,
            minimizers(k, w).hasher(&NtHasher::<false>::new(k)).run_once(ps));
        emit_case(&mut cases, &seq, k, w, "nt", true, None,
            canonical_minimizers(k, w).hasher(&NtHasher::<true>::new(k)).run_once(ps));
        emit_case(&mut cases, &seq, k, w, "mul", false, None,
            minimizers(k, w).hasher(&MulHasher::<false>::new(k)).run_once(ps));
        emit_case(&mut cases, &seq, k, w, "mul", true, None,
            canonical_minimizers(k, w).hasher(&MulHasher::<true>::new(k)).run_once(ps));
        emit_case(&mut cases, &seq, k, w, "antilex", false, None,
            minimizers(k, w).hasher(&AntiLexHasher::<false>::new(k)).run_once(ps));
        emit_case(&mut cases, &seq, k, w, "antilex", true, None,
            canonical_minimizers(k, w).hasher(&AntiLexHasher::<true>::new(k)).run_once(ps));
        // seeded variants (the seeds used by this repo's property tests).
        // Untyped integer literals via a macro, so the seed adapts to
        // whatever integer type the (unvendored) seq-hash trait expects.
        macro_rules! seeded_cases {
            ($seed:literal) => {
                emit_case(&mut cases, &seq, k, w, "nt", true, Some($seed),
                    canonical_minimizers(k, w)
                        .hasher(&NtHasher::<true>::new_with_seed(k, $seed))
                        .run_once(ps));
                emit_case(&mut cases, &seq, k, w, "mul", false, Some($seed),
                    minimizers(k, w)
                        .hasher(&MulHasher::<false>::new_with_seed(k, $seed))
                        .run_once(ps));
                emit_case(&mut cases, &seq, k, w, "antilex", true, Some($seed),
                    canonical_minimizers(k, w)
                        .hasher(&AntiLexHasher::<true>::new_with_seed(k, $seed))
                        .run_once(ps));
            };
        }
        seeded_cases!(1234);
        seeded_cases!(101010);
    }
    println!("{{\"cases\":[\n{}\n]}}", cases.join(",\n"));
}
